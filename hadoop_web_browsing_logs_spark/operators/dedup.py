"""Placeholder — filled in during its milestone."""
