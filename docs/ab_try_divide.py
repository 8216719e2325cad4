"""Interleaved same-session A/B: try_divide vs plain `/` vs when-guard in the
cosine kernel (VERDICT r6 item 3).

Round 6 replaced `/` with `try_divide` in the cosine kernel (zero-norm
totality, DuckDB NULL parity) and the same round's bench showed the cosine
family regressing above the pack median — but on a loaded machine, so noise
and kernel cost were confounded. This sweep measures the kernel cost with the
only protocol this box trusts (memory: bench-noise): alternate variants
within ONE session, compare medians.

The probe is the nearest-center shape (vectors.py:41-75) — broadcast centers
array, per-point codegen'd argmin fold — the most cosine-dense query in the
registry (N_CENTERS cosine evaluations per point), reduced to a 1-row agg so
py4j transfer doesn't pollute the timing.

Run: python docs/ab_try_divide.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from hadoop_web_browsing_logs_spark.functions.vector import dot, norm  # noqa: E402
from hadoop_web_browsing_logs_spark.operators.vectors import fixture_centers  # noqa: E402
from hadoop_web_browsing_logs_spark.operators._util import t  # noqa: E402
from hadoop_web_browsing_logs_spark.session import get_spark  # noqa: E402


def assign_sum(spark, sf_dir: str, kernel: str):
    points = t(spark, sf_dir, "embeddings").withColumn("_pn", norm("embedding"))
    c = fixture_centers(spark, sf_dir).withColumn("_cn", norm("cvec"))
    c_arr = c.agg(F.collect_list(F.struct("center_id", "cvec", "_cn")).alias("_cs"))

    def sim(c0):
        d = dot(F.col("embedding"), c0["cvec"])
        den = F.col("_pn") * c0["_cn"]
        if kernel == "try_divide":
            return F.try_divide(d, den)
        if kernel == "plain":
            return d / den
        if kernel == "guard":
            return F.when(den == 0, F.lit(None)).otherwise(d / den)
        raise ValueError(kernel)

    best = F.array_min(
        F.transform(
            "_cs",
            lambda c0: F.struct(
                (F.lit(1.0) - sim(c0)).alias("dist"),
                c0["center_id"].alias("center_id"),
            ),
        )
    )
    out = (
        points.crossJoin(F.broadcast(c_arr))
        .withColumn("_best", best)
        .select("vec_id", F.col("_best.center_id").alias("center_id"), F.col("_best.dist").alias("dist"))
    )
    return out.agg(F.sum("dist").alias("s"), F.count(F.lit(1)).alias("n"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark()
    kernels = ["try_divide", "plain", "guard"]
    # warm-up: JIT, parquet footer cache, broadcast machinery
    for k in kernels:
        assign_sum(spark, sf_dir, k).collect()
    times: dict[str, list[float]] = {k: [] for k in kernels}
    sums: dict[str, tuple] = {}
    for _ in range(reps):
        for k in kernels:  # interleaved: each rep touches every variant
            t0 = time.perf_counter()
            row = assign_sum(spark, sf_dir, k).collect()[0]
            times[k].append(time.perf_counter() - t0)
            sums[k] = (row.s, row.n)
    med = {k: statistics.median(v) for k, v in times.items()}
    base = med["try_divide"]
    print(json.dumps({
        "sf_dir": sf_dir, "reps": reps,
        "median_sec": {k: round(v, 4) for k, v in med.items()},
        "vs_try_divide": {k: round(v / base, 4) for k, v in med.items()},
        "all_sec": {k: [round(x, 4) for x in v] for k, v in times.items()},
        "result_identical": len({s for s in sums.values()}) == 1,
        "results": {k: (float(s), int(n)) for k, (s, n) in sums.items()},
    }))


if __name__ == "__main__":
    main()
