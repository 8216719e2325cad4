"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query over /root/testdata/sf0.001.
``queries()`` / ``oracle_sql()`` — the engine's declared capability surface,
sourced from :mod:`hadoop_web_browsing_logs_spark.plans.registry`; every
operator from SURVEY.md §2 registers itself there with a DuckDB oracle twin
where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_web_browsing_logs_spark.plans import registry as _registry

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's end-to-end pipeline, Spark-first — tokenize →
    clean → stopword anti-join → inverted index over ``documents``
    (ProcessData.java Job 1 re-expressed; falls back to the TPC-H Q1-style
    aggregate if the text pipeline is unavailable)."""
    # events.parquet needs the nanos legacy conf; harmless to set here for
    # driver-created sessions that didn't come from our session factory.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    qs = _registry.queries()
    for flagship in ("q_ref_pipeline", "q_text_inverted_index", "q1_pricing_summary"):
        if flagship in qs:
            return qs[flagship](spark, SF_SMOKE_DIR)
    raise RuntimeError("no flagship query registered")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
