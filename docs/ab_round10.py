"""Round-10 interleaved same-session A/B sweep (SCALE.md protocol: one
session, A/B/A/B per rep, medians + minima — never back-to-back separate
bench invocations).

Sweep — label propagation's two-exchange claim at skew (VERDICT r9 item 7).
The LPA docstring argues: per iteration, (dst,label)-keyed partial-combined
weight sums + a dst-keyed argmax (TWO exchanges) beat the one-exchange
alternative that repartitions the RAW edge-sized join output by dst and
then runs both aggregations exchange-free on the dst-clustered data
(HashPartitioning(dst) satisfies ClusteredDistribution(dst,label), so
Catalyst inserts no further exchange — but every joined edge row crosses
the wire, and a hot destination lands on ONE partition).

The fixture is built for the worst case the claim covers: a hot-community
graph where one celebrity node receives HOT_DEG in-edges (single hot dst
key) on top of a uniform background — the shape where the raw-shuffle
route concentrates its biggest payload on one task while the partial-agg
route pre-collapses that destination to at most (#labels-seen × partitions)
rows before the wire.

Both variants must produce BIT-IDENTICAL labels (exact BIGINT votes,
deterministic argmax) — asserted before timing.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hadoop_web_browsing_logs_spark.operators.graph import (
    LPA_ITERATIONS,
    _aqe_off,
    label_propagation,
)
from hadoop_web_browsing_logs_spark.session import get_spark

REPS = int(os.environ.get("AB_REPS", "5"))
BG_EDGES = int(os.environ.get("AB_BG_EDGES", "1000000"))
BG_NODES = int(os.environ.get("AB_BG_NODES", "50000"))
HOT_DEG = int(os.environ.get("AB_HOT_DEG", "500000"))


def hot_community_edges(spark):
    """Deterministic skewed graph: BG_EDGES uniform background edges over
    BG_NODES nodes (md5-hash pseudo-randomness, no RNG) plus HOT_DEG
    in-edges onto celebrity node 0 from distinct sources."""
    bg = spark.range(BG_EDGES).select(
        (F.conv(F.substring(F.md5(F.concat(F.lit("s"), "id")), 1, 7), 16, 10)
         .cast("bigint") % BG_NODES).alias("src"),
        (F.conv(F.substring(F.md5(F.concat(F.lit("d"), "id")), 1, 7), 16, 10)
         .cast("bigint") % BG_NODES).alias("dst"),
    )
    hot = spark.range(1, HOT_DEG + 1).select(
        (F.col("id") % BG_NODES).alias("src"), F.lit(0).cast("bigint").alias("dst")
    )
    return (
        bg.unionAll(hot)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", F.lit(1).cast("bigint").alias("w"))
    )


def lpa_one_exchange(edges, iterations=LPA_ITERATIONS):
    """The rejected alternative: identical init/semantics, but the raw
    join output is repartitioned by dst, after which BOTH aggregations run
    exchange-free on the dst-clustered rows — one exchange per iteration,
    carrying every joined edge row (no map-side pre-collapse)."""
    spark = edges.sparkSession
    with _aqe_off(spark):
        e = (
            edges.select("src", "dst", F.col("w").cast("bigint").alias("w"))
            .repartition("src")
            .sortWithinPartitions("src")
            .localCheckpoint(eager=False)
        )
        labels = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
            .select("node", F.col("node").alias("label"))
            .localCheckpoint(eager=False)
        )
    for i in range(iterations):
        joined = e.join(labels, e.src == labels.node).repartition("dst")
        votes = joined.groupBy("dst", "label").agg(F.sum("w").alias("lw"))
        best = votes.groupBy("dst").agg(
            F.min(
                F.struct((-F.col("lw")).alias("nw"), F.col("label").alias("label"))
            ).alias("b")
        )
        labels = best.select(F.col("dst").alias("node"), F.col("b.label").alias("label"))
        if (i + 1) < iterations:
            with _aqe_off(spark):
                labels = labels.localCheckpoint(eager=False)
    return labels


def shuffle_volume_probe(spark, edges, iterations=LPA_ITERATIONS):
    """Analytic per-iteration shuffle-row accounting. The raw one-exchange
    route ships |join output| = |edges| rows every iteration; the
    partial-agg route's first exchange carries at most the per-partition
    distinct (dst,label) pairs — globally bounded by the distinct count
    printed here. Early iterations (labels still ~all distinct) give
    partial agg nothing to collapse; converged iterations collapse hard."""
    with _aqe_off(spark):
        e = (
            edges.select("src", "dst", F.col("w").cast("bigint").alias("w"))
            .repartition("src")
            .sortWithinPartitions("src")
            .localCheckpoint(eager=False)
        )
        labels = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
            .select("node", F.col("node").alias("label"))
            .localCheckpoint(eager=False)
        )
    n_edges = e.count()
    for i in range(iterations):
        joined = e.join(labels, e.src == labels.node)
        pairs = joined.select("dst", "label").distinct().count()
        print(
            f"  iter {i + 1}: raw-route shuffle rows = {n_edges}, "
            f"partial-agg distinct (dst,label) = {pairs} "
            f"(collapse x{n_edges / max(pairs, 1):.1f})"
        )
        votes = joined.groupBy("dst", "label").agg(F.sum("w").alias("lw"))
        best = votes.groupBy("dst").agg(
            F.min(
                F.struct((-F.col("lw")).alias("nw"), F.col("label").alias("label"))
            ).alias("b")
        )
        labels = best.select(F.col("dst").alias("node"), F.col("b.label").alias("label"))
        with _aqe_off(spark):
            labels = labels.localCheckpoint(eager=False)


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("ab_round10")
    edges = hot_community_edges(spark)

    # semantics first: exact BIGINT votes + deterministic argmax mean the
    # two plans must agree on every (node, label) row
    a = label_propagation(edges)
    b = lpa_one_exchange(edges)
    mism = a.join(b, "node").filter(a.label != b.label).count()
    assert mism == 0, f"{mism} label mismatches between variants"
    print(f"variants agree on all labels; |nodes|={a.count()}")

    print("shuffle-volume accounting:")
    shuffle_volume_probe(spark, edges)

    variants = {
        "lpa_two_exchange_head": lambda: noop(label_propagation(edges)),
        "lpa_one_exchange_raw": lambda: noop(lpa_one_exchange(edges)),
    }
    for fn in variants.values():  # warm-up
        fn()
    samples: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(REPS):
        for k, fn in variants.items():
            samples[k].append(timed(fn))
    print("load_avg:", os.getloadavg()[0])
    print(f"bg_edges={BG_EDGES} bg_nodes={BG_NODES} hot_deg={HOT_DEG} reps={REPS}")
    for k, ts in samples.items():
        print(
            f"{k}: median={statistics.median(ts):.3f} min={min(ts):.3f} "
            f"samples={[round(t, 3) for t in ts]}"
        )


if __name__ == "__main__":
    main()
