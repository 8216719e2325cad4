"""Placeholder — filled in during M5."""
