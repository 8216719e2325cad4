"""fan_out (round 17): scale-adaptive scan fan-out.

Every fixture table is a single-row-group parquet file, so its scan plans
as ONE task and all pre-exchange map work runs on one core. fan_out
spreads the raw rows when (and only when) the planned scan parallelism is
below the session's default parallelism — a no-op on inputs that already
parallelize, so no exchange is added at real corpus scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_web_browsing_logs_spark.operators._util import fan_out, t

from .conftest import SF_DIR


def test_fan_out_spreads_single_partition_scan(spark):
    docs = t(spark, SF_DIR, "documents")
    assert docs.rdd.getNumPartitions() == 1  # the single-row-group premise
    spread = fan_out(docs)
    p = spark.sparkContext.defaultParallelism
    assert spread.rdd.getNumPartitions() == p
    # multiset of rows unchanged by the round-robin spread
    a = sorted((r.doc_id, r.text) for r in docs.select("doc_id", "text").collect())
    b = sorted((r.doc_id, r.text) for r in spread.select("doc_id", "text").collect())
    assert a == b


def test_fan_out_noop_when_already_parallel(spark):
    p = spark.sparkContext.defaultParallelism
    wide = t(spark, SF_DIR, "documents").repartition(p + 3)
    # already >= default parallelism: fan_out must return the input object
    # itself (no extra exchange in the plan)
    assert fan_out(wide) is wide


def test_fan_out_preserves_filtered_scan_values(spark):
    docs = t(spark, SF_DIR, "documents").filter(F.col("doc_id") % 4 == 0)
    a = sorted(r.doc_id for r in docs.select("doc_id").collect())
    b = sorted(r.doc_id for r in fan_out(docs).select("doc_id").collect())
    assert a == b and len(a) > 0
