"""Round-11 interleaved A/B experiments (run from /root/repo).

Per the bench-noise policy (SCALE.md; memory: only trust interleaved
same-session sweeps), every round-11 performance claim that compares two
code shapes was measured by alternating the variants inside ONE session.
This script reproduces them:

1. Lloyd seeding: the public lloyd_kmeans wrapper (rank-based
   k-smallest-id seeds — a TakeOrdered + 8-row window) vs the old
   filter-based seeding (vec_id < k). Round-11 result at sf0.1:
   new 2.71 s vs old 2.83 s median of 5 — cost-neutral; the wrapper's
   seed pick does not tax the recurrence.

2. SemDeDup pair-stage norm hoisting: norms computed once per ROW before
   the within-cluster self-join vs recomputed inside every pair
   similarity. Round-11 result at sf0.1: 5.5 s vs 11.5 s (the hoist
   removes 2 of 3 interpreted higher-order folds per pair). Output
   bit-identical (same doubles, same fold), so the oracle is untouched.
"""

from __future__ import annotations

import statistics
import time

from pyspark.sql import functions as F

from hadoop_web_browsing_logs_spark.operators.vectors import (
    N_CENTERS,
    kmeans_lloyd,
    lloyd_kmeans,
    load_vectors,
)
from hadoop_web_browsing_logs_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("ab-round11")

    def run_new():
        lloyd_kmeans(load_vectors(spark, SF), N_CENTERS).write.format(
            "noop"
        ).mode("overwrite").save()

    def run_old():
        vs = load_vectors(spark, SF)
        seeds = vs.filter(F.col("vec_id") < N_CENTERS).select(
            F.col("vec_id").cast("int").alias("center_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("c"),
        )
        kmeans_lloyd(vs, seeds).write.format("noop").mode("overwrite").save()

    for f in (run_new, run_old):  # warm-up
        f()
    samples: dict[str, list[float]] = {"new": [], "old": []}
    for _ in range(5):  # interleaved, not back-to-back
        samples["new"].append(timed(run_new))
        samples["old"].append(timed(run_old))
    for name, ts in samples.items():
        print(f"lloyd seeding {name}: median {statistics.median(ts):.3f}s  {[round(x, 3) for x in ts]}")

    spark.stop()


if __name__ == "__main__":
    main()
