"""Round-9 interleaved same-session A/B sweeps (SCALE.md protocol: one
session, A/B/A/B per rep, medians + minima — never back-to-back separate
bench invocations).

Sweep 1 — PageRank checkpoint partitioning (VERDICT r8 item 3): HEAD
pagerank (pre-partitioned+sorted static tables under _aqe_off) vs an inline
copy of the round-8 implementation (plain lazy checkpoints) on the same
sf0.1 purchase graph.

Sweep 2 — q_sim_cosine_topk (+23% r7->r8, VERDICT r8 item 5): repeated
timing of the UNCHANGED query interleaved with the stable co-probe
q_window_rank, to decide noise vs regression at matched load.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hadoop_web_browsing_logs_spark.operators.graph import (
    PR_DAMPING,
    PR_ITERATIONS,
    _purchase_edges,
    pagerank,
)
from hadoop_web_browsing_logs_spark.operators.relational import dsum
from hadoop_web_browsing_logs_spark.plans.registry import get_query
from hadoop_web_browsing_logs_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))


def pagerank_r8(edges, iterations=PR_ITERATIONS, damping=PR_DAMPING):
    """Inline copy of the round-8 implementation: un-partitioned lazy
    checkpoints (every iteration re-exchanges both static tables)."""
    teleport = 1.0 - damping
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    base = nodes.crossJoin(F.broadcast(nn)).localCheckpoint(eager=False)
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    ew = (
        edges.join(outw, "src")
        .select(
            "src",
            "dst",
            F.try_divide(F.col("w").cast("double"), F.col("ow").cast("double")).alias("ratio"),
        )
        .localCheckpoint(eager=False)
    )
    ranks = base.select("node", (F.lit(1.0) / F.col("n")).alias("pr"))
    for _ in range(iterations):
        contrib = (
            ew.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(dsum(F.col("pr") * F.col("ratio"), 15).alias("contrib"))
            .withColumnRenamed("dst", "node")
        )
        ranks = base.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(teleport) / F.col("n")
                + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("pr"),
        )
    return ranks


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("ab_round9")
    variants = {
        "pagerank_head": lambda: noop(pagerank(_purchase_edges(spark, SF)).orderBy("node")),
        "pagerank_r8": lambda: noop(pagerank_r8(_purchase_edges(spark, SF)).orderBy("node")),
        "sim_cosine_topk": lambda: noop(get_query("q_sim_cosine_topk").fn(spark, SF)),
        "window_rank_probe": lambda: noop(get_query("q_window_rank").fn(spark, SF)),
    }
    # warm-up
    for fn in variants.values():
        fn()
    samples: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(REPS):
        for k, fn in variants.items():
            samples[k].append(timed(fn))
    print("load_avg:", os.getloadavg()[0])
    for k, ts in samples.items():
        print(
            f"{k}: median={statistics.median(ts):.3f} min={min(ts):.3f} "
            f"samples={[round(t, 3) for t in ts]}"
        )


if __name__ == "__main__":
    main()
