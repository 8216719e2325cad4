"""Sinks.

The reference's only sink is tab-separated text via ``TextOutputFormat``
(A10 — ProcessData.java:38, 659, 676), including the quirky incidence-vector
serialization ``term\\t[1,0,1,]`` with a trailing comma
(ProcessData.java:462-469) and implicitly term-sorted lines (shuffle sort,
SURVEY Q8). That format is kept behind :func:`write_reference_text` for
compatibility; the engine default is partitioned Parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Default sink: Parquet, optionally hive-partitioned.

    Partitioned writes are the scale path — downstream scans prune on the
    partition columns without touching data files.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink (native, zlib-compressed by default) — for downstream
    consumers standardized on ORC; same partitioned-layout semantics as
    ``write_parquet``."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_tsv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Tab-separated text sink — reference ``TextOutputFormat`` parity
    (ProcessData.java:38)."""
    df.write.mode(mode).option("sep", "\t").csv(path)


def reference_vector_string(vec_col) -> "F.Column":
    """Serialize an ARRAY<INT> incidence vector in the reference's exact text
    format ``[v1,v2,...,vN,]`` — trailing comma included
    (ProcessData.java:462-469)."""
    return F.concat(F.lit("["), F.concat_ws("", F.transform(vec_col, lambda v: F.concat(v.cast("string"), F.lit(",")))), F.lit("]"))


def write_reference_text(index_df: DataFrame, path: str, term_col: str = "term", vec_col: str = "vec") -> None:
    """Job-1-output-compatible sink: ``term\\t[1,0,1,]`` lines, term-sorted
    (the reference's implicit shuffle sort, SURVEY Q8)."""
    (
        index_df.sort(term_col)
        .select(
            F.concat_ws("\t", F.col(term_col), reference_vector_string(F.col(vec_col))).alias("value")
        )
        .write.mode("overwrite")
        .text(path)
    )


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a fragmented parquet directory into
    ``ceil(total_bytes / target_bytes)`` right-sized files. Returns the
    output file count.

    The operational pass every streaming/incremental sink needs at scale —
    micro-batches and per-partition task writes leave thousands of small
    files whose per-file open/footer cost dominates later scans. Input size
    comes from the filesystem listing (no data scan); the rewrite is one
    ``repartition(n)`` job, shuffling each row exactly once. For
    partitioned tables, run per partition directory so pruning still holds.
    """
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(src):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_out = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(src).repartition(n_out).write.mode("overwrite").parquet(dst)
    return n_out


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partition + sort-within-partition write: rows are globally
    range-distributed on ``sort_cols`` and each output file is internally
    sorted on them, so parquet row-group min/max statistics become tight,
    disjoint ranges — scans with predicates on the sort columns skip whole
    row groups/files instead of reading and filtering. The write-side twin
    of predicate pushdown, and the single highest-leverage layout decision
    for a 100 TB append-only fact table (a coarse Z-order substitute when
    one sort dimension dominates)."""
    out = df.repartitionByRange(*( [n_files] if n_files else [] ), *sort_cols)
    out.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def zorder_column(df: DataFrame, cols: list[str], bits: int = 12) -> "F.Column":
    """Morton (Z-order) curve key over numeric ``cols``.

    Each column is min-max scaled to a ``bits``-bit integer grid (one tiny
    stats job — the same move as catalog range statistics; NULLs map to
    cell 0 so they cluster together), then the grid coordinates are
    bit-interleaved into one BIGINT: bit ``i`` of column ``j`` lands at
    position ``i * len(cols) + j``. Sorting by the result orders rows
    along the space-filling curve, so nearby rows are close in EVERY
    dimension at once. The whole key is a pure JVM expression tree
    (shift/and/or over ~bits x n_cols terms) — codegen'd, no UDF.

    ``bits * len(cols)`` must stay <= 62 to fit the BIGINT."""
    if bits * len(cols) > 62:
        raise ValueError("bits * n_cols must fit in a signed 64-bit key")
    # stats over FINITE values only: one NaN would make F.max return NaN
    # (Spark orders NaN above every double), which slips past the `mx <= mn`
    # guard (NaN comparisons are False) and silently NaNs every row's scaled
    # coordinate — the dimension would lose all pruning (ADVICE r8). ±Inf
    # likewise collapses the scale; row-side NaN/Inf values just clamp.
    def _finite(c: str) -> "F.Column":
        d = F.col(c).cast("double")
        return F.when(~F.isnan(d) & (F.abs(d) != float("inf")), d)

    stats = df.agg(
        *[F.min(_finite(c)).alias(f"mn_{c}") for c in cols],
        *[F.max(_finite(c)).alias(f"mx_{c}") for c in cols],
    ).first()
    n = len(cols)
    cells = []
    top = (1 << bits) - 1
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None or mx is None or mx <= mn:
            cells.append(F.lit(0).cast("long"))
            continue
        scaled = (F.col(c).cast("double") - F.lit(mn)) / F.lit(mx - mn) * top
        cell = F.least(F.greatest(F.floor(scaled), F.lit(0)), F.lit(top)).cast("long")
        cells.append(F.coalesce(cell, F.lit(0).cast("long")))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, cell in enumerate(cells):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(cell, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return z


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int | None = None,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Z-order clustered write (the OPTIMIZE ZORDER layout pass): rows are
    range-distributed and sorted along a Morton curve over ``cols``, so
    parquet row-group min/max statistics become tight in EVERY listed
    dimension — a scan filtering on ANY of the z-columns skips most files,
    where a plain sort only prunes on its leading column. The standard
    layout decision for a 100 TB fact table queried along multiple
    independent predicates (ts x user, orderkey x partkey)."""
    out = df.withColumn("_z", zorder_column(df, cols, bits))
    out = out.repartitionByRange(*([n_files] if n_files else []), "_z")
    out.sortWithinPartitions("_z").drop("_z").write.mode(mode).parquet(path)
