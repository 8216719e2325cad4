"""Round-12 A/B harnesses (SCALE.md 'Round 12' entries) — run each from
/root/repo in its own session; interleaved same-session sampling per the
bench-noise policy.

1. Hot-cluster guard vs unguarded on actual skew  -> python docs/ab_round12.py skew
2. SemDeDup shared-assignment memo (cold vs warm) -> python docs/ab_round12.py memo
3. q_text_novelty string vs xxhash64 exchanges    -> python docs/ab_round12.py novelty
"""

from __future__ import annotations

import statistics
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from hadoop_web_browsing_logs_spark.plans.registry import get_query
from hadoop_web_browsing_logs_spark.session import get_spark, release_caches

SF = "/root/testdata/sf0.1"


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def ab_skew() -> None:
    """Guarded (cap=128) vs unguarded (cap=inf) semantic dedup on a
    4000x64d corpus with 90% near-identical boilerplate. Round-12
    measurement: 6.0-8.4 s vs 178.9 s (21-30x), prune parity 99.2%."""
    import numpy as np

    from hadoop_web_browsing_logs_spark.operators.dedup import semantic_dedup

    spark = get_spark("ab12-skew", cpus=32)
    rng = np.random.default_rng(7)
    n, d, hot = 4000, 64, 3600
    base = rng.standard_normal(d)
    base /= np.linalg.norm(base)
    rows = [(i, [float(x) for x in base + rng.normal(0, 1e-3, d)]) for i in range(hot)]
    rows += [(i, [float(x) for x in rng.standard_normal(d)]) for i in range(hot, n)]
    vs = (
        spark.createDataFrame(rows, ["vec_id", "embedding"])
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .repartition(32)
        .localCheckpoint()
    )

    def run(cap: int):
        t0 = time.perf_counter()
        out = semantic_dedup(vs, k=8, tau=0.9, max_cluster=cap)
        ndup = out.filter("is_dup").count()
        return time.perf_counter() - t0, ndup

    run(128)  # warm-up
    tg, dg = run(128)
    tu, du = run(10**9)
    tg2, _ = run(128)
    print(f"guarded cap=128: {tg:.2f}s / {tg2:.2f}s dups={dg}")
    print(f"unguarded      : {tu:.2f}s dups={du}")


def ab_memo() -> None:
    """keepfar with cold vs warm shared-assignment memo. Round-12 result:
    cost-NEUTRAL at sf0.1 (1.44 vs 1.53 s medians, inside ambient) — the
    fold is map-only trivia once the Lloyd centers are memoized; the memo
    is kept for the structural corpus-scan saving at scale."""
    from hadoop_web_browsing_logs_spark.operators import dedup as D

    spark = get_spark("ab12-memo", cpus=32)
    qsem = get_query("q_dedup_semantic").fn
    qfar = get_query("q_dedup_semantic_keepfar").fn
    _noop(qsem(spark, SF))
    _noop(qfar(spark, SF))
    cold, warm = [], []
    for _ in range(4):
        release_caches(spark)
        _noop(qsem(spark, SF))
        D._SEMDEDUP_ASSIGN_MEMO.clear()  # the round-11 shape: keepfar rebuilds
        cold.append(_noop(qfar(spark, SF)))
        release_caches(spark)
        _noop(qsem(spark, SF))
        warm.append(_noop(qfar(spark, SF)))
    print("cold:", [round(x, 3) for x in cold], "median", round(statistics.median(cold), 3))
    print("warm:", [round(x, 3) for x in warm], "median", round(statistics.median(warm), 3))


def ab_novelty() -> None:
    """String-keyed (round-11 shape) vs xxhash64-fingerprint novelty
    exchanges. Round-12 result: 1.231 -> 1.004 s median (-18%), values
    identical row-for-row."""
    from hadoop_web_browsing_logs_spark.operators._util import t
    from hadoop_web_browsing_logs_spark.operators.relational import dsum
    from hadoop_web_browsing_logs_spark.operators.text import ws_tokens

    spark = get_spark("ab12-novelty", cpus=32)

    def novelty_strings(spark, sf_dir):
        docs = t(spark, sf_dir, "documents")
        toks = F.filter(ws_tokens("text"), lambda x: x != "")
        d = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 3)
        tri = d.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("toks", i),
                        F.element_at("toks", i + 1),
                        F.element_at("toks", i + 2),
                    ),
                )
            ).alias("sh"),
        ).distinct()
        df = tri.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
        n = F.count(F.lit(1))
        uniq = F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
        return (
            tri.join(df, "sh")
            .groupBy("doc_id")
            .agg(
                n.alias("n_shingles"),
                uniq.alias("n_unique"),
                (uniq / n).alias("unique_pct"),
                (dsum(F.log("df"), 6) / n).alias("mean_log_df"),
            )
            .orderBy("doc_id")
        )

    new_fn = get_query("q_text_novelty").fn
    _noop(new_fn(spark, SF))
    _noop(novelty_strings(spark, SF))
    a, b = [], []
    for _ in range(5):
        a.append(_noop(novelty_strings(spark, SF)))
        b.append(_noop(new_fn(spark, SF)))
    print("strings :", [round(x, 3) for x in a], "median", round(statistics.median(a), 3))
    print("xxhash64:", [round(x, 3) for x in b], "median", round(statistics.median(b), 3))
    va = sorted(map(tuple, novelty_strings(spark, SF).collect()))
    vb = sorted(map(tuple, new_fn(spark, SF).collect()))
    print("values identical:", va == vb)


if __name__ == "__main__":
    {"skew": ab_skew, "memo": ab_memo, "novelty": ab_novelty}[sys.argv[1]]()
