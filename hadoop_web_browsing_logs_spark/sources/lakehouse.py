"""Lakehouse-format connectors (Delta Lake / Iceberg / Hudi) — gated stubs.

The v1 container ships no lakehouse jars (pyspark_guide.md: "Delta/Iceberg/
Hudi need their jars on the classpath — not in the v1 image; stub connectors
behind an import-try"). The API surface is declared here so pipelines can be
written against it today; with the jars + catalog conf present the same calls
run unchanged.

Until then, :func:`merge_into` falls back to the pure-DataFrame upsert
(``operators.relational3.merge_upsert``) against parquet — same logical
result, minus ACID/time-travel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def read_delta(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Delta scan (optionally time-traveled). Requires delta-spark on the
    classpath; raises a clear error otherwise."""
    if not delta_available():
        raise NotImplementedError(
            "delta-spark is not installed in this environment — add the delta jars "
            "and spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension"
        )
    reader = spark.read.format("delta")
    if version is not None:
        reader = reader.option("versionAsOf", version)
    return reader.load(path)


def merge_into(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: str,
    fmt: str = "parquet",
) -> None:
    """MERGE INTO target USING updates ON key — Delta MERGE when available,
    otherwise the read-upsert-rewrite fallback on parquet (identical final
    table contents; no ACID isolation)."""
    if fmt == "delta" and delta_available():
        from delta.tables import DeltaTable

        tgt = DeltaTable.forPath(spark, target_path)
        (
            tgt.alias("t")
            .merge(updates.alias("u"), f"t.{key} = u.{key}")
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return
    from ..operators.relational3 import merge_upsert

    target = spark.read.parquet(target_path)
    merged = merge_upsert(target, updates, key)
    # Same contract as the Delta branch: the TARGET path holds the merged
    # table afterwards. Spark cannot overwrite a path it is lazily reading,
    # so materialize to a temp sibling, then swap via the Hadoop FileSystem
    # API (portable to HDFS/S3A, unlike os.rename). The delete+rename pair is
    # the documented non-ACID caveat vs real Delta MERGE.
    tmp_path = target_path + "__merge_tmp"
    merged.write.mode("overwrite").parquet(tmp_path)
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(target_path).getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath(target_path), True)
    if not fs.rename(hpath(tmp_path), hpath(target_path)):
        raise IOError(f"rename {tmp_path} -> {target_path} failed")
