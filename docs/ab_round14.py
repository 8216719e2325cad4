"""Round-14 A/B: the containment hot-shingle guard at REAL skew (VERDICT
r13 item 4).

Round 13 shipped the cap default-on and argued the count-over-window guard
form from plan shape (ONE shh-keyed exchange vs the groupBy+semi-join
form's two), but the only measurement was at sf0.1 where the cap is
DORMANT (max shingle df 4) — a wall-clock wash proves nothing about the
skewed case the guard exists for. This replicates the SemDeDup guard
methodology: a CONSTRUCTED boilerplate-heavy corpus at sf0.1 scale
(2,000 docs, 800 of them sharing a 44-token boilerplate block whose ~40
shingles each carry df=800 >> cap=128), interleaved warm A/B, median of 5:

  uncapped   containment_report(docs, max_shingle_df=None) — the quadratic
             blow-up baseline: the 800-doc hot shingles put 800² pairs on
             each of ~40 join keys (~25.6M raw pair rows) AND link
             unrelated docs into junk containment rows.
  window     the production default — count-over-window guard (no orderBy,
             one shh-keyed exchange), cap ACTIVE.
  join       the groupBy-count + semi-join-back guard form (two exchanges
             of the corpus-sized shingle table), cap ACTIVE — inlined here
             as a measurement twin of dedup.py's window form; NOT product
             code.

Run: python docs/ab_round14.py    (results land in SCALE.md round 14)
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, functions as F  # noqa: E402
from pyspark.sql.window import Window as W  # noqa: E402

from hadoop_web_browsing_logs_spark.operators.dedup import (  # noqa: E402
    CONTAINMENT_MAX_SHINGLE_DF,
    CONTAINMENT_TAU,
    containment_report,
)
from hadoop_web_browsing_logs_spark.session import get_spark  # noqa: E402


def _corpus(spark) -> DataFrame:
    """2,000 docs at sf0.1 scale: 800 boilerplate-heavy (shared 44-token
    block + 25 unique tokens each), 1,100 fully unique, and 100 planted
    genuine containment pairs among unique docs so the capped output stays
    non-trivial."""
    boiler = " ".join(f"legal{i} disclaimer{i}" for i in range(22))  # 44 tokens
    rows = []
    for i in range(800):
        uniq = " ".join(f"u{i}x{j}" for j in range(25))
        rows.append((i, f"{boiler} {uniq}"))
    for i in range(800, 1900):
        rows.append((i, " ".join(f"v{i}x{j}" for j in range(40))))
    for k in range(100):  # planted: doc (1900+2k) contained in (1901+2k)
        core = " ".join(f"w{k}x{j}" for j in range(12))
        rows.append((1900 + 2 * k, core))
        rows.append((1901 + 2 * k, f"{core} extra{k}a extra{k}b extra{k}c"))
    return spark.createDataFrame(rows, ["doc_id", "text"]).repartition(32)


def _containment_join_guard(docs: DataFrame, cap: int) -> DataFrame:
    """Measurement twin of dedup.containment_report with the guard in the
    groupBy-count + semi-join-back form (everything downstream identical)."""
    from hadoop_web_browsing_logs_spark.operators.llm_pipeline import shingles_5gram

    sh = (
        shingles_5gram(docs)
        .select("doc_id", F.xxhash64("sh").alias("shh"))
        .distinct()
    )
    keep = (
        sh.groupBy("shh")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= cap)
        .select("shh")
    )
    sh = sh.join(keep, "shh", "left_semi").localCheckpoint(eager=False)
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    pairs = (
        sh.join(sh.select(F.col("doc_id").alias("container_id"), "shh"), "shh")
        .filter(F.col("doc_id") != F.col("container_id"))
        .groupBy("doc_id", "container_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    cont = F.col("shared").cast("double") / F.col("n_sh")
    hits = (
        pairs.join(sz, "doc_id")
        .select("doc_id", "container_id", cont.alias("containment"))
        .filter(F.col("containment") >= CONTAINMENT_TAU)
    )
    w = W.partitionBy("doc_id")
    return (
        hits.withColumn(
            "rnk",
            F.row_number().over(
                w.orderBy(F.col("containment").desc(), F.col("container_id"))
            ),
        )
        .withColumn("n_containers", F.count(F.lit(1)).over(w))
        .filter(F.col("rnk") == 1)
        .select("doc_id", "container_id", "containment", "n_containers")
        .orderBy("doc_id")
    )


def main() -> None:
    import tempfile

    spark = get_spark("ab14")
    # stage the fixture as parquet, NOT a localCheckpoint: release_caches()
    # between timed runs drops ALL checkpoint blocks, including a fixture's
    stage = tempfile.mkdtemp(prefix="ab14_docs_") + "/docs.parquet"
    _corpus(spark).write.mode("overwrite").parquet(stage)
    docs = spark.read.parquet(stage)

    variants = {
        "uncapped": lambda: containment_report(docs, max_shingle_df=None),
        "window": lambda: containment_report(docs),  # production default
        "join": lambda: _containment_join_guard(docs, CONTAINMENT_MAX_SHINGLE_DF),
    }

    counts = {k: v().count() for k, v in variants.items()}
    print("row counts:", counts)

    from hadoop_web_browsing_logs_spark.session import release_caches

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        release_caches(spark)
        return dt

    for k, v in variants.items():  # warm-up pass
        run_once(v)
    samples: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(5):  # interleaved rounds
        for k, v in variants.items():
            samples[k].append(run_once(v))
    for k, ts in samples.items():
        print(f"{k}: median {statistics.median(ts):.3f}s  "
              f"min {min(ts):.3f}s  samples {[round(x, 3) for x in ts]}")


if __name__ == "__main__":
    main()
