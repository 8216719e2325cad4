"""Round-17 A/B: fan out the single-row-group embeddings scan before the
covariance explode (the scan stage is ONE task — all fixture parquet files
are single-row-group, so every pre-exchange map stage is serial).

A = registry q_vec_covariance (scan-stage explode+partial agg, 1 task)
B = same query with vs repartitioned to defaultParallelism after the scan

Interleaved same-session A/B with per-sample cache release; rows compared
for exact equality once.
"""
from __future__ import annotations

import sys, time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from hadoop_web_browsing_logs_spark.session import get_spark, release_query_caches
from hadoop_web_browsing_logs_spark.plans.registry import get_query
from hadoop_web_browsing_logs_spark.operators.vectors import EMBEDDING_DIM, load_vectors
from hadoop_web_browsing_logs_spark.operators.relational import dsum

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def cov_fanout(spark, sf_dir):
    d = EMBEDDING_DIM
    vs = load_vectors(spark, sf_dir).repartition(spark.sparkContext.defaultParallelism)
    n = vs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    rows = vs.select(
        F.posexplode(
            F.transform(
                "embedding",
                lambda x, i: F.transform(
                    F.slice("embedding", i + 1, F.lit(d)),
                    lambda y: x.cast("double") * y.cast("double"),
                ),
            )
        ).alias("i0", "arr")
    ).select((F.col("i0") + 1).alias("i"), "arr")
    col_sums = [
        F.sum(
            F.round(F.try_element_at("arr", F.lit(k)) * 1000000).try_cast("bigint")
        ).alias(f"_s{k}")
        for k in range(1, d + 1)
    ]
    m = (
        rows.groupBy("i")
        .agg(*col_sums)
        .select(
            "i",
            F.posexplode(F.array(*[F.col(f"_s{k}") for k in range(1, d + 1)])).alias("k0", "_ssum"),
        )
        .filter(F.col("i") + F.col("k0") <= d)
        .select("i", (F.col("i") + F.col("k0")).alias("j"), (F.col("_ssum") / 1000000.0).alias("sxy"))
    )
    mean = (
        vs.select(F.posexplode("embedding").alias("i0", "x"))
        .select((F.col("i0") + 1).alias("i"), F.col("x").cast("double").alias("x"))
        .groupBy("i")
        .agg(dsum("x", 6).alias("s"))
    )
    ma = mean.select(F.col("i").alias("i"), F.col("s").alias("sa"))
    mb = mean.select(F.col("i").alias("j"), F.col("s").alias("sb"))
    nn = F.col("n")
    return (
        m.join(ma, "i")
        .join(mb, "j")
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            (F.col("sxy") / nn - (F.col("sa") / nn) * (F.col("sb") / nn)).alias("cov"),
        )
    )


def main():
    spark = get_spark("ab_fanout_cov", cpus=CPUS)
    qa = get_query("q_vec_covariance").fn

    def run(fn):
        t0 = time.time()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        sec = time.time() - t0
        release_query_caches(spark)
        return sec

    # row equality once
    ra = sorted(tuple(r) for r in qa(spark, SF).collect())
    rb = sorted(tuple(r) for r in cov_fanout(spark, SF).collect())
    print("rows_equal:", ra == rb, "n:", len(ra), flush=True)
    if ra != rb:
        diff = [(x, y) for x, y in zip(ra, rb) if x != y]
        print("first diffs:", diff[:3], flush=True)

    # warmup each arm once, then interleave
    run(qa); run(cov_fanout)
    a, b = [], []
    for _ in range(3):
        a.append(run(qa))
        b.append(run(cov_fanout))
    a.sort(); b.sort()
    print(f"A registry  : {a} median {a[1]:.3f}", flush=True)
    print(f"B fanout    : {b} median {b[1]:.3f}", flush=True)
    print(f"speedup: {a[1] / b[1]:.2f}x", flush=True)


if __name__ == "__main__":
    main()
