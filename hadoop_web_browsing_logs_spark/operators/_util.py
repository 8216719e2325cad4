"""Shared helpers for operator modules."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a fixture table (Parquet, vectorized scan)."""
    return load_table(spark, sf_dir, name)


def one_group(col: str | Column) -> Column:
    """A constant-valued but NON-foldable window partition key.

    Ranking a small post-``limit(k)`` result still needs a whole-frame
    window; an empty partition spec makes WindowExec warn (and at scale,
    funnel everything through one task), while ``partitionBy(F.lit(0))`` is
    constant-folded by Catalyst back to the empty spec. ``pmod(length(c), 1)``
    is always 0 but data-dependent, so the optimizer keeps it and the window
    stays an explicit single-group partition — only ever applied to k-row
    inputs (k <= 20 here)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.length(c.cast("string")), F.lit(1))
