"""Similarity search over embeddings (SURVEY B11) — brute-force cosine top-k
as the exact baseline, random-hyperplane LSH as the 100 TB path.

The brute force generalizes the reference's nearest-center scan
(ProcessData.java:521-532) from k centers to the full corpus. At scale the
all-pairs crossJoin is O(n·m); the LSH variant buckets vectors by a 16-bit
hyperplane signature so candidate generation becomes an equi-join on the
bucket key — a shuffle join on a small key space instead of a nested loop.

Storage-block lifecycle (ADVICE r5): the lazy ``localCheckpoint(eager=False)``
frames in the recall/candidate paths pin RDD blocks that outlive the
consuming action. This retention is INTENTIONAL for the engine's execution
model — queries are single-shot plan factories whose result is consumed once
by the caller (driver gate, bench pass, pytest), and the blocks let the
top-k and candidate-count branches of one invocation share one
materialization; unpersisting inside the factory would race the caller's
action. Long-lived sessions that invoke these factories repeatedly should
call :func:`hadoop_web_browsing_logs_spark.session.release_caches`
between logical requests to drop accumulated blocks (bench isolation and the
pytest suite run each query a bounded number of times, so local runs stay
bounded without it).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.vector import (
    cosine_similarity,
    dot,
    duck_cosine_distance,
    duck_cosine_similarity,
)
from ..plans.registry import query
from ._util import fan_out, t
from .vectors import DUCK_VECTORS, N_CENTERS, load_vectors

TOP_K = 5
QUERY_STRIDE = 50  # vec_id % stride == 0 → query points

N_PLANES = 16
N_BANDS = 4  # banded LSH: 4 bands × 4 planes — any-band match → candidate
LSH_SEED = 42
EMB_DIM = 64


#: ~the 99th-percentile pairwise cosine on the fixture (max ≈ 0.45) — high
#: enough to be a selective radius, low enough to return real neighbor sets.
RANGE_TAU = 0.3


@query(
    "q_sim_range_search",
    oracle=f"""
    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           {duck_cosine_similarity('q.embedding', 'c.embedding')} AS sim
    FROM {DUCK_VECTORS} q CROSS JOIN {DUCK_VECTORS} c
    WHERE q.vec_id % {QUERY_STRIDE} = 0 AND q.vec_id <> c.vec_id
      AND {duck_cosine_similarity('q.embedding', 'c.embedding')} >= {RANGE_TAU}
    """,
    category="similarity",
    description=(
        "Cosine range search (all neighbors with sim >= tau, not top-k) for "
        "strided query points — the radius-query twin of the top-k scan. "
        "Map-only after broadcasting the query side: no window, no shuffle "
        "of the candidate corpus; only over-threshold pairs survive the "
        "scan stage. The exact baseline the banded-LSH candidate join "
        "approximates at 100 TB."
    ),
)
def q_sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vector import norm

    e = load_vectors(spark, sf_dir)
    q = e.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    ).withColumn("q_norm", norm("q_vec"))
    c = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")).withColumn(
        "c_norm", norm("c_vec")
    )
    sim = F.try_divide(dot("q_vec", "c_vec"), F.col("q_norm") * F.col("c_norm"))
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", sim.alias("sim"))
        .filter(F.col("sim") >= RANGE_TAU)
    )


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = TOP_K,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact cosine top-k: crossJoin + per-query window. ``queries`` has
    (q_id, q_vec); ``candidates`` has (c_id, c_vec).

    Norms are precomputed once per vector before the crossJoin (each norm
    would otherwise be re-evaluated per PAIR — 3× the array work). The
    division still evaluates the identical double expression per pair, so
    oracle bit-equality is preserved.

    Join orientation (round-12 plan audit): the CANDIDATE corpus streams
    and the query side broadcasts — same declared shape as range search.
    The unhinted ``q.crossJoin(c)`` built the nested-loop broadcast on the
    RIGHT operand, i.e. shipped the corpus to every task; harmless at
    fixture scale, a scale-killer on a 100 TB candidate table. Queries are
    the bounded side by contract (strided probe points / a single dense
    query) and the forced hint bakes that contract in, bypassing AQE's
    size check (ADVICE r12) — a caller whose query set is itself
    corpus-scale must pass ``broadcast_queries=False`` (the unhinted plan
    then falls back to AQE's size-checked strategy — typically a
    BroadcastNestedLoopJoin only while the chosen build side fits the
    threshold, a cartesian product otherwise — instead of a forced
    driver-side broadcast), and should partition the query set and loop
    rather than flip the broadcast."""
    from ..functions.vector import norm

    q = queries.withColumn("q_norm", norm("q_vec"))
    # fan_out (round 17): the corpus side STREAMS through the nested-loop
    # broadcast join, so all |Q|x|C| dot folds run inside the candidate
    # scan stage — one task on the single-row-group fixture scan. The sim
    # value is a per-pair expression (no cross-row float accumulation),
    # so partitioning cannot change any bit; no-op at real scale.
    c = fan_out(candidates).withColumn("c_norm", norm("c_vec"))
    sim = F.try_divide(dot("q_vec", "c_vec"), F.col("q_norm") * F.col("c_norm"))
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    return (
        c.crossJoin(F.broadcast(q) if broadcast_queries else q)
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


@query(
    "q_sim_cosine_topk",
    oracle=f"""
    SELECT * FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id,
               {duck_cosine_similarity('q.embedding', 'c.embedding')} AS sim,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {duck_cosine_similarity('q.embedding', 'c.embedding')} DESC,
                                           c.vec_id) AS rnk
        FROM {DUCK_VECTORS} q CROSS JOIN {DUCK_VECTORS} c
        WHERE q.vec_id % {QUERY_STRIDE} = 0 AND q.vec_id <> c.vec_id
    ) WHERE rnk <= {TOP_K}
    """,
    category="similarity",
    description="Brute-force cosine top-k neighbors for strided query points — the exact ANN baseline.",
)
def q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_vectors(spark, sf_dir)
    queries = e.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    candidates = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    return brute_force_topk(queries, candidates)


def _hyperplanes() -> list[list[float]]:
    """Deterministic random hyperplanes (fixed seed — FIXTURES.md §3 rule 4)."""
    rng = np.random.default_rng(LSH_SEED)
    return rng.standard_normal((N_PLANES, EMB_DIM)).tolist()


def lsh_band_signatures(vec_col: str, n_bands: int = N_BANDS) -> F.Column:
    """Banded random-hyperplane signatures: ARRAY<STRUCT<band, sig>> where
    band b's sig packs the sign bits of planes [b·w, (b+1)·w). A pair is a
    candidate if ANY band signature matches — the classic OR-of-ANDs
    construction that trades precision for recall. Pure SQL expression over
    literal planes — stays in codegen, no UDF.

    ``n_bands`` splits the same N_PLANES: more/narrower bands → higher
    candidate-collision probability 1-(1-p^w)^b for every pairwise angle →
    higher recall AND more candidate pairs (the theory curve the band-width
    pytest asserts)."""
    planes = _hyperplanes()
    width = N_PLANES // n_bands
    bands = []
    for b in range(n_bands):
        sig = F.lit(0)
        for j in range(width):
            plane = planes[b * width + j]
            lit = F.array(*[F.lit(float(x)) for x in plane])
            sig = sig + F.when(dot(F.col(vec_col), lit) >= 0, 1 << j).otherwise(0)
        bands.append(F.struct(F.lit(b).alias("band"), sig.alias("sig")))
    return F.array(*bands)


@query(
    "q_sim_lsh_ann",
    oracle=None,  # approximate by construction; recall vs brute force is the
    # pytest check — the query itself reports per-query recall.
    category="similarity",
    description="Random-hyperplane LSH ANN: bucket by 16-bit signature, equi-join candidates, top-k in-bucket; reports recall@k vs the exact brute-force top-k (self-evaluating).",
)
def q_sim_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_ann_recall(spark, sf_dir)


def lsh_candidate_pairs(spark: SparkSession, sf_dir: str, n_bands: int = N_BANDS) -> DataFrame:
    """Deduped LSH candidate pairs (q_id, q_vec, c_id, c_vec) for strided
    query points — any-band signature match (OR-of-ANDs).

    Pair generation and the multi-band dedup run on BARE IDS — the 64-dim
    vectors do not ride the candidate shuffle (a pair row is 16 bytes, a
    vector ~520); they are joined back only for the surviving deduped pairs,
    the same discipline as dedup.minhash_lsh_pairs' verify stage."""
    # fan_out (round 17): the 16-hyperplane-dot signature fold below runs in
    # the corpus scan stage — one task on the single-row-group fixture scan
    # (and the checkpointed signature table inherited that 1 partition).
    # Per-row fold, no cross-row accumulation: partition-independent.
    full = fan_out(load_vectors(spark, sf_dir))
    e = (
        full.select(
            "vec_id", F.explode(lsh_band_signatures("embedding", n_bands)).alias("bs")
        )
        .select("vec_id", "bs.band", "bs.sig")
        # materialize once (round 16): both sides of the band equi-join
        # scan this subtree, so the signature fold — 16 hyperplane dots
        # per vector, the corpus-scan hot loop — ran TWICE per query.
        # The table is (vec_id, band, sig): n_bands rows x 20 bytes per
        # vector, corpus-linear and payload-free.
        .localCheckpoint(eager=False)
    )
    queries = e.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("q_id"), "band", "sig"
    )
    cands = e.select(F.col("vec_id").alias("c_id"), "band", "sig")
    pair_ids = (
        queries.join(cands, ["band", "sig"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id")
        .dropDuplicates(["q_id", "c_id"])
    )
    q_vecs = F.broadcast(
        full.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
    )
    c_vecs = full.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    return pair_ids.join(q_vecs, "q_id").join(c_vecs, "c_id").select(
        "q_id", "q_vec", "c_id", "c_vec"
    )


def lsh_ann_recall(
    spark: SparkSession,
    sf_dir: str,
    n_bands: int = N_BANDS,
    include_candidate_counts: bool = False,
) -> DataFrame:
    pairs = lsh_candidate_pairs(spark, sf_dir, n_bands)
    sim = cosine_similarity("q_vec", "c_vec")
    # score once, materialize once (lazy localCheckpoint): the top-k branch
    # and — for the margin gate — the per-query candidate-count branch both
    # read the same blocks instead of re-running band-join + cosine verify
    scored = pairs.select("q_id", "c_id", sim.alias("sim")).localCheckpoint(eager=False)
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    lsh_topk = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= TOP_K
    )

    # the exact baseline takes its query points straight from the table — NOT
    # from the band-exploded stream (N_BANDS rows per q_id there would make
    # each true neighbor appear N_BANDS times in the crossJoin and collapse
    # "top-5" to ~2 distinct neighbors, understating recall — ADVICE round 1).
    e = load_vectors(spark, sf_dir)
    exact = brute_force_topk(
        e.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        ),
        e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")),
    ).select(F.col("q_id").alias("exact_q_id"), F.col("c_id").alias("exact_c_id"))

    # ONE consumer for the exact baseline (round 17, guide §7.2 "duplicated
    # subtrees"): the old shape read `exact` twice — a semi-join for the
    # hits AND a groupBy for the per-query k — and Catalyst does not CSE
    # across join inputs, so the brute-force crossJoin + window (the
    # query's heaviest leg, ~1.3 s at sf0.1) EXECUTED TWICE per call.
    # Counting from the exact side instead (left join against the LSH
    # top-k with a hit flag) computes k and found in one aggregation over
    # one brute-force evaluation; both sides are row_number-deduped (q, c)
    # sets, so the flag-sum equals the old semi-join count exactly, and a
    # query with no LSH hits sums to found = 0 like the old coalesce.
    out = (
        exact.join(
            lsh_topk.select("q_id", "c_id", F.lit(1).alias("hit")),
            (F.col("q_id") == F.col("exact_q_id"))
            & (F.col("c_id") == F.col("exact_c_id")),
            "left",
        )
        .groupBy("exact_q_id")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.coalesce(F.sum("hit"), F.lit(0)).alias("found"),
        )
        .select(
            F.col("exact_q_id").alias("q_id"),
            "k",
            "found",
            (F.col("found") / F.col("k")).alias("recall"),
        )
    )
    if include_candidate_counts:
        m = scored.groupBy("q_id").agg(F.count(F.lit(1)).alias("m"))
        out = (
            out.join(m, "q_id", "left")
            .withColumn("m", F.coalesce("m", F.lit(0)))  # zero-candidate queries count
        )
    return out


@query(
    "q_sim_ivf_candidates",
    oracle=f"""
    WITH centers AS (
        SELECT CAST(vec_id AS INTEGER) AS center_id, embedding AS cvec
        FROM {DUCK_VECTORS} v WHERE vec_id < {N_CENTERS}
    ),
    assign AS (
        SELECT e.vec_id, c.center_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {duck_cosine_distance('e.embedding', 'c.cvec')}, c.center_id) AS rn
        FROM {DUCK_VECTORS} e CROSS JOIN centers c
    ),
    cells AS (SELECT vec_id, center_id FROM assign WHERE rn = 1),
    probes AS (
        SELECT q.vec_id AS q_id, c.center_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {duck_cosine_distance('q.embedding', 'c.cvec')}, c.center_id) AS rn
        FROM {DUCK_VECTORS} q CROSS JOIN centers c
        WHERE q.vec_id % {QUERY_STRIDE} = 0
    )
    SELECT p.q_id, d.vec_id AS c_id,
           {duck_cosine_similarity('q.embedding', 'd.embedding')} AS sim
    FROM probes p
    JOIN cells ce ON ce.center_id = p.center_id
    JOIN {DUCK_VECTORS} d ON d.vec_id = ce.vec_id
    JOIN {DUCK_VECTORS} q ON q.vec_id = p.q_id
    WHERE p.rn <= 2 AND d.vec_id <> p.q_id
    """,
    category="similarity",
    description=(
        "IVF candidate generation, hash-proved: cell assignment for every "
        "vector (the nearest-center quantizer), each query probes its 2 "
        "nearest cells via a map-only sorted-slice over the broadcast "
        "center array (no window exchange), and the candidate set + exact "
        "cosine per candidate must match the quadratic DuckDB twin row for "
        "row. With the deterministic first-8 centers the whole bucketed "
        "probe path is SQL-expressible — this is the driver-hash evidence "
        "that the IVF index probes the right cells; q_sim_ivf_ann layers "
        "the approximate top-k + recall on top."
    ),
)
def q_sim_ivf_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vector import norm
    from .vectors import fixture_centers, nearest_center

    e = load_vectors(spark, sf_dir)
    centers = fixture_centers(spark, sf_dir)
    cells = nearest_center(e, centers).select(
        F.col("vec_id").alias("cell_vec"), F.col("center_id").alias("cell_center")
    )

    cn = centers.withColumn("_cn", norm("cvec"))
    c_arr = cn.agg(F.collect_list(F.struct("center_id", "cvec", "_cn")).alias("_cs"))
    qn = e.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    ).withColumn("_qn", norm("q_vec"))
    cand = F.transform(
        "_cs",
        lambda c: F.struct(
            (F.lit(1.0) - F.try_divide(dot(F.col("q_vec"), c["cvec"]), F.col("_qn") * c["_cn"])).alias("qdist"),
            c["center_id"].alias("center_id"),
        ),
    )
    probes = (
        qn.crossJoin(F.broadcast(c_arr))
        .select("q_id", "q_vec", "_qn", F.slice(F.array_sort(cand), 1, 2).alias("_top2"))
        .select("q_id", "q_vec", "_qn", F.explode("_top2").alias("_p"))
        .select("q_id", "q_vec", "_qn", F.col("_p.center_id").alias("center_id"))
    )
    data = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")).withColumn(
        "_dn", norm("c_vec")
    )
    sim = F.try_divide(dot("q_vec", "c_vec"), F.col("_qn") * F.col("_dn"))
    return (
        probes.join(cells, probes["center_id"] == cells["cell_center"])
        .join(data, F.col("cell_vec") == F.col("c_id"))
        .filter(F.col("c_id") != F.col("q_id"))
        .select("q_id", "c_id", sim.alias("sim"))
    )


@query(
    "q_sim_ivf_ann",
    oracle=None,  # approximate (probe-limited); self-evaluating recall, with
    # the floor asserted in pytest alongside the LSH variant.
    category="similarity",
    description=(
        "IVF-style ANN: coarse-quantize every vector to its nearest centroid "
        "(the q_vec_nearest_center operator IS the quantizer), probe the "
        "query's 2 closest centroid cells, exact top-k within the probed "
        "cells; reports recall@k vs brute force. The inverted-file analogue "
        "of the reference's center assignment, used as an index."
    ),
)
def q_sim_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_ann_recall(spark, sf_dir)


def ivf_ann_recall(
    spark: SparkSession, sf_dir: str, include_candidate_counts: bool = False
) -> DataFrame:
    from .vectors import fixture_centers, nearest_center

    e = load_vectors(spark, sf_dir)
    centers = fixture_centers(spark, sf_dir)

    # cell assignment for all vectors (the inverted file)
    cells = nearest_center(e, centers).select("vec_id", "center_id")
    data = e.join(cells, "vec_id").select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"), F.col("center_id")
    )

    # queries probe their 2 nearest cells
    from ..functions.vector import dot, norm

    queries = e.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    qn = queries.withColumn("_qn", norm("q_vec"))
    cn = centers.withColumn("_cn", norm("cvec"))
    qdist = F.lit(1.0) - F.try_divide(dot("q_vec", "cvec"), F.col("_qn") * F.col("_cn"))
    wq = W.partitionBy("q_id").orderBy("qdist", "center_id")
    probes = (
        qn.crossJoin(F.broadcast(cn))
        .select("q_id", "q_vec", "center_id", qdist.alias("qdist"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 2)
        .select("q_id", "q_vec", "center_id")
    )

    # exact top-k within probed cells only; like lsh_ann_recall, the scored
    # candidate set materializes once (lazy localCheckpoint) so the gate's
    # candidate-count branch reuses it instead of re-probing
    sim = cosine_similarity("q_vec", "c_vec")
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    scored = (
        probes.join(data, "center_id")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", sim.alias("sim"))
        .localCheckpoint(eager=False)
    )
    ivf_topk = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= TOP_K
    )

    exact = brute_force_topk(
        queries,
        e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")),
    ).select(F.col("q_id").alias("exact_q_id"), F.col("c_id").alias("exact_c_id"))
    hits = ivf_topk.join(
        exact,
        (F.col("q_id") == F.col("exact_q_id")) & (F.col("c_id") == F.col("exact_c_id")),
        "left_semi",
    )
    out = (
        exact.groupBy("exact_q_id")
        .agg(F.count(F.lit(1)).alias("k"))
        .join(
            hits.groupBy("q_id").agg(F.count(F.lit(1)).alias("found")),
            F.col("exact_q_id") == F.col("q_id"),
            "left",
        )
        .select(
            F.col("exact_q_id").alias("q_id"),
            "k",
            F.coalesce("found", F.lit(0)).alias("found"),
            (F.coalesce("found", F.lit(0)) / F.col("k")).alias("recall"),
        )
    )
    if include_candidate_counts:
        m = scored.groupBy("q_id").agg(F.count(F.lit(1)).alias("m"))
        out = (
            out.join(m, "q_id", "left")
            .withColumn("m", F.coalesce("m", F.lit(0)))  # zero-candidate queries count
        )
    return out


# ---------------------------------------------------------------------------
# Oracle-checkable LSH candidate generation (the embedding analogue of
# q_dedup_minhash_lsh_portable's scale-correctness evidence)
# ---------------------------------------------------------------------------

CAND_STRIDE = 5  # bounds the oracle's quadratic all-pairs side


def lsh_anyband_oracle_parts() -> tuple[str, str, str]:
    """Shared DuckDB twin pieces for the banded hyperplane bucketing: the
    strided signature CTE (``WITH s AS …``), the any-band-match condition
    over aliases ``a``/``b``, and the exact-cosine verify expression — the
    SAME seeded plane literals, the SAME sequential-DOUBLE dot products
    (sign-of-dot is bit-portable — see functions/vector.py determinism
    contract) as the Spark side, so every consumer's candidate SET and
    cosine values agree bit-for-bit with a quadratic oracle. Consumers:
    the portable-candidates query here and dedup's bucketed embedding
    near-dup twin."""
    from ..functions.vector import duck_dot, duck_norm

    planes = _hyperplanes()
    width = N_PLANES // N_BANDS

    def dot_lit(vec: str, plane: list[float]) -> str:
        lits = "[" + ",".join(repr(x) for x in plane) + "]"
        return (
            f"list_sum(list_transform(range(1, {EMB_DIM}+1), "
            f"i -> CAST({vec}[i] AS DOUBLE) * ({lits}[i])))"
        )

    def band_sig(vec: str, b: int) -> str:
        terms = " + ".join(
            f"(CASE WHEN {dot_lit(vec, planes[b * width + j])} >= 0 THEN {1 << j} ELSE 0 END)"
            for j in range(width)
        )
        return f"({terms})"

    sig_list = "[" + ", ".join(band_sig("embedding", b) for b in range(N_BANDS)) + "]"
    any_band = " OR ".join(f"a.sig[{b + 1}] = b.sig[{b + 1}]" for b in range(N_BANDS))
    cte = f"""
    WITH s AS (
      SELECT vec_id, embedding, {duck_norm("embedding")} AS nrm, {sig_list} AS sig
      FROM {DUCK_VECTORS} v WHERE vec_id % {CAND_STRIDE} = 0
    )
    """
    verify_sim = f"{duck_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm)"
    return cte, any_band, verify_sim


def _lsh_candidates_oracle() -> str:
    cte, any_band, verify_sim = lsh_anyband_oracle_parts()
    return f"""
    {cte}
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {verify_sim} AS sim
    FROM s a JOIN s b ON a.vec_id < b.vec_id
    WHERE {any_band}
    """


@query(
    "q_sim_lsh_candidates_portable",
    oracle=_lsh_candidates_oracle(),
    category="similarity",
    description=(
        "Hyperplane-LSH candidate generation, hash-proved: every "
        "(band, signature)-bucket-joined pair plus its exact cosine, checked "
        "bit-for-bit against an all-pairs DuckDB twin evaluating the same "
        "seeded plane literals. Threshold-free on purpose — it certifies the "
        "bucketing math itself (signature signs, any-band rule, verify "
        "cosine), which the self-evaluating recall queries build on. Scale "
        "shape mirrors the MinHash path: the band join carries IDs only, "
        "embeddings re-join for the verify, the base table is checkpointed "
        "once."
    ),
)
def q_sim_lsh_candidates_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    e0 = (
        load_vectors(spark, sf_dir)
        .filter(F.col("vec_id") % CAND_STRIDE == 0)
        .select("vec_id", "embedding")
        .localCheckpoint(eager=False)
    )
    sigs = e0.select("vec_id", F.explode(lsh_band_signatures("embedding")).alias("bs")).select(
        "vec_id", "bs.band", "bs.sig"
    )
    a = sigs.select(F.col("vec_id").alias("id_a"), "band", "sig")
    b = sigs.select(F.col("vec_id").alias("id_b"), "band", "sig")
    cand = (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    return (
        cand.join(e0.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")), "id_a")
        .join(e0.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")), "id_b")
        .select("id_a", "id_b", cosine_similarity("va", "vb").alias("sim"))
    )


# ---------------------------------------------------------------------------
# Driver-hashable gates for the approximate family
#
# The LSH/IVF ANN queries are approximate by construction, so their outputs
# can't hash-match a SQL twin. The gates convert the self-evaluating recall
# into a deterministic boolean: Spark computes mean recall@k vs brute force
# and emits ok = (recall >= floor); the oracle is the constant the healthy
# engine must produce. A regression in bucketing, probing, or the verify
# cosine flips ok to false → driver hash mismatch → red row.
# ---------------------------------------------------------------------------

#: The LSH gate compares recall against the RANDOM-CANDIDATE baseline
#: measured on the same fixture (expected recall of a uniformly random
#: candidate set of the same per-query size: mean |C(q)| / (n-1)), per
#: ADVICE r4 — an absolute floor drifts with every fixture regeneration,
#: while the margin is scale-free. Bucketing must beat random by 1.5×
#: (observed 2.02× at sf0.001 / 2.52× at sf0.01 on the round-5 fixture,
#: ≥34% headroom); LSH_RECALL_MIN guards the degenerate case where a broken
#: pipeline emits near-empty candidate sets, making the margin vacuous.
LSH_RECALL_MARGIN = 1.5
LSH_RECALL_MIN = 0.3
#: The IVF probe covers ~n_probe/n_cells of the points (cells are
#: near-uniform on the fixture: 2 of 8 ≈ 25%), so the old absolute floor of
#: 0.25 sat exactly AT the random baseline — zero margin. 1.4× the measured
#: baseline (observed ratio 1.76–2.08× across SFs on the round-5 fixture,
#: ≥26% headroom) restores a real signal; 0.2 is the degenerate-case guard.
IVF_RECALL_MARGIN = 1.4
IVF_RECALL_MIN = 0.2


def _margin_recall_gate(
    spark: SparkSession,
    sf_dir: str,
    per_query: DataFrame,
    margin: float,
    min_abs: float,
) -> DataFrame:
    """ok = mean recall beats ``margin`` × the random-candidate baseline
    measured on the same fixture AND a degenerate-case absolute minimum.

    ``per_query`` is a recall frame carrying an ``m`` column (per-query
    candidate-set size, zero-filled — the recall pipelines emit it from
    their own checkpointed candidate set, so the gate adds no second
    candidate-generation pass). The baseline is the expected recall of a
    uniformly random candidate set of the same per-query size:
    mean m / (n-1), zero-candidate queries counted (dropping them would
    flatter the baseline). Scale-free where an absolute floor drifts with
    every fixture regeneration; the absolute minimum guards the case where
    a broken pipeline emits near-empty candidate sets, making the margin
    vacuous (ADVICE r4)."""
    rec = per_query.agg(
        F.count(F.lit(1)).alias("_nq"),
        F.avg("recall").alias("_r"),
        F.avg("m").alias("_am"),
    )
    n_pts = load_vectors(spark, sf_dir).agg(F.count(F.lit(1)).alias("_n"))
    random_recall = F.col("_am") / (F.col("_n") - 1)
    return rec.crossJoin(F.broadcast(n_pts)).select(
        (
            (F.col("_nq") > 0)
            & (F.col("_r") >= min_abs)
            & (F.col("_r") >= margin * random_recall)
        ).alias("ok")
    )


@query(
    "q_sim_lsh_ann_gate",
    oracle="SELECT TRUE AS ok",
    category="similarity",
    description=(
        "Driver gate for the LSH ANN path: mean recall@5 over all strided "
        "query points must beat the random-candidate baseline MEASURED ON "
        "THE SAME FIXTURE (mean candidate-set size / (n-1)) by 1.5x, and "
        "clear a 0.3 degenerate-case floor (ADVICE r4: margin over measured "
        "baseline instead of an absolute constant that drifts with every "
        "fixture regeneration; observed 2.02-2.52x across SFs). "
        "Hash-comparable despite the underlying query being approximate — "
        "the oracle is the constant a healthy engine emits."
    ),
    tags=("calibrated",),
)
def q_sim_lsh_ann_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _margin_recall_gate(
        spark,
        sf_dir,
        lsh_ann_recall(spark, sf_dir, include_candidate_counts=True),
        LSH_RECALL_MARGIN,
        LSH_RECALL_MIN,
    )


@query(
    "q_sim_ivf_ann_gate",
    oracle="SELECT TRUE AS ok",
    category="similarity",
    description=(
        "Driver gate for the IVF ANN path: mean recall@5 with a 2-cell "
        "probe must beat 1.4x the random-candidate baseline measured on the "
        "same fixture, plus a 0.2 degenerate-case floor. The old absolute "
        "0.25 floor sat exactly AT the random baseline (2-of-8 near-uniform "
        "cells cover ~25% of points) — zero margin; observed 0.44-0.52 "
        "recall is 1.76-2.08x baseline. Same constant-oracle margin pattern "
        "as the LSH gate."
    ),
    tags=("calibrated",),
)
def q_sim_ivf_ann_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _margin_recall_gate(
        spark,
        sf_dir,
        ivf_ann_recall(spark, sf_dir, include_candidate_counts=True),
        IVF_RECALL_MARGIN,
        IVF_RECALL_MIN,
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval (round 12): reciprocal-rank fusion of the two retrieval
# modalities the engine already certifies — BM25 lexical ranking (text.py)
# and brute-force cosine ANN (this module). RRF (Cormack et al. 2009) is the
# standard fusion a RAG / topical-mining pipeline runs when neither sparse
# nor dense retrieval dominates: score(d) = Σ_lists 1/(K + rank_list(d)),
# K = 60. Contributions are exact BIGINT micro-scores (10^9 DIV (K + rank)),
# so fusion, ordering, and the driver hash never touch float summation.
# ---------------------------------------------------------------------------

RRF_K = 60
RRF_LIST_K = 20  # depth of each input rank list
RRF_TOP_K = 10
RRF_QUERY_VEC = 0  # the dense query point; BM25_QUERY_TERMS is the sparse one


def _rrf_micro_sql(rank_col: str) -> str:
    return f"COALESCE(CAST(1000000000 AS BIGINT) // ({RRF_K} + {rank_col}), 0)"


def rrf_fuse(
    ranked: dict[str, DataFrame], k: int = RRF_K, top_k: int | None = None
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of named rank lists.

    Each input DataFrame has (doc_id, rank) — rank 1-based, one row per
    candidate, typically a top-K list. Returns one row per doc appearing in
    ANY list: (doc_id, r_<name> per input, rrf_micro), ordered by
    (rrf_micro DESC, doc_id), truncated to ``top_k`` when given.

    Contributions are exact BIGINTs — 10^9 DIV (k + rank), absent list = 0 —
    so fusion and ordering never depend on float summation. Each input list
    is deduped to its BEST (minimum) rank per doc_id before the fold
    (ADVICE r12): a duplicate doc_id inside one list would otherwise fan
    out the full-outer join and double-count that doc's contribution — a
    K-row aggregation, free, and a no-op on already-unique lists. Scale
    shape: the inputs are K-row lists (the expensive part is PRODUCING
    them — BM25, ANN — not fusing), so the full-outer fold is trivially
    small; the fold is driver-plan-side only, no collect."""
    fused = None
    for name, df in ranked.items():
        cur = df.groupBy("doc_id").agg(
            F.min(F.col("rank").cast("bigint")).alias(f"r_{name}")
        )
        fused = cur if fused is None else fused.join(cur, ["doc_id"], "full_outer")
    if fused is None:
        raise ValueError("rrf_fuse needs at least one rank list")
    micro = [
        F.coalesce(
            F.expr(f"CAST(1000000000 AS BIGINT) div ({k} + r_{name})"),
            F.lit(0).cast("bigint"),
        )
        for name in ranked
    ]
    total = micro[0]
    for m in micro[1:]:
        total = total + m
    out = fused.select(
        "doc_id", *[f"r_{name}" for name in ranked], total.alias("rrf_micro")
    ).orderBy(F.col("rrf_micro").desc(), F.col("doc_id").asc_nulls_last())
    return out.limit(top_k) if top_k is not None else out


RRF2_QUERY_TERMS = ("filter", "scan", "batch", "stream")
RRF2_QUERY_VEC = 7  # second fixed dense query point (exists at every SF)


def _hybrid_rrf_oracle(
    terms: tuple[str, ...] | None = None, query_vec: int = RRF_QUERY_VEC
) -> str:
    from .text import _BM25_MICRO_SQL, BM25_QUERY_TERMS

    if terms is None:
        terms = BM25_QUERY_TERMS
    return f"""
    WITH tok AS (
        SELECT d.doc_id, u.token AS term
        FROM documents d, UNNEST(list_transform(string_split_regex(lower(trim(d.text)), '\\s+'), x -> regexp_replace(x, '\\pP', '', 'g'))) AS u(token)
        WHERE u.token <> ''
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS tot FROM tok),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok
        WHERE term IN {terms!r}
        GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    per AS (
        SELECT tf.doc_id, SUM({_BM25_MICRO_SQL}) AS micro
        FROM tf JOIN dl USING (doc_id) JOIN df USING (term)
        CROSS JOIN n CROSS JOIN tot
        GROUP BY tf.doc_id
    ),
    lex AS (
        SELECT doc_id, CAST(r_lex AS BIGINT) AS r_lex FROM (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY micro DESC, doc_id) AS r_lex
            FROM per
        ) WHERE r_lex <= {RRF_LIST_K}
    ),
    vec AS (
        SELECT doc_id, CAST(r_vec AS BIGINT) AS r_vec FROM (
            SELECT c.vec_id AS doc_id,
                   ROW_NUMBER() OVER (
                       ORDER BY {duck_cosine_similarity('q.embedding', 'c.embedding')} DESC,
                                c.vec_id) AS r_vec
            FROM {DUCK_VECTORS} q CROSS JOIN {DUCK_VECTORS} c
            WHERE q.vec_id = {query_vec} AND c.vec_id <> {query_vec}
        ) WHERE r_vec <= {RRF_LIST_K}
    )
    SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
           l.r_lex, v.r_vec,
           {_rrf_micro_sql('l.r_lex')} + {_rrf_micro_sql('v.r_vec')} AS rrf_micro
    FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
    ORDER BY rrf_micro DESC, doc_id LIMIT {RRF_TOP_K}
    """


@query(
    "q_sim_hybrid_rrf",
    oracle=_hybrid_rrf_oracle(),
    category="similarity",
    description=(
        "Hybrid retrieval via reciprocal-rank fusion (K=60): the BM25 "
        "top-20 for the fixed 4-term query fused with the cosine top-20 "
        "for the fixed dense query point, top-10 by exact BIGINT micro-RRF "
        "(1e9 DIV (60+rank) per list, missing list = 0). Scale shape: each "
        "input list is the already-certified kernel (one corpus tokenize + "
        "doc-keyed shuffle for BM25; broadcast-query map-only scan + "
        "TakeOrdered for dense), and the fusion itself joins two K-row "
        "tables — driver-side-trivial at any corpus size. All-integer "
        "fusion, so ranking is order-independent and hash-exact."
    ),
    tags=("similarity", "retrieval", "multipoint:hybrid_rrf"),
)
def q_sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import BM25_QUERY_TERMS

    return hybrid_rrf(spark, sf_dir, BM25_QUERY_TERMS, RRF_QUERY_VEC)


def hybrid_rrf(
    spark: SparkSession,
    sf_dir: str,
    terms: tuple[str, ...],
    query_vec: int,
) -> DataFrame:
    """One hybrid-retrieval request: BM25 top-RRF_LIST_K for ``terms`` fused
    with cosine top-RRF_LIST_K around embedding ``query_vec`` via exact
    BIGINT micro-RRF. Shared by both registered query points (round 14) so
    an accidental point-specific green in one can't hide in the kernel."""
    from .text import bm25_rank
    from ._util import one_group

    docs = t(spark, sf_dir, "documents")
    # rank on the exact BIGINT micro the kernel orders by (ADVICE r12) —
    # no float hop between bm25_rank's ordering and this window's
    lex = bm25_rank(
        docs, terms, top_k=RRF_LIST_K, include_micro=True
    ).select("doc_id", "micro")
    # asc_nulls_last: DuckDB's ASC default puts NULLs last, Spark's first —
    # the same guard bm25_rank itself applies to this tie-break
    wl = W.partitionBy(one_group("doc_id")).orderBy(
        F.col("micro").desc(), F.col("doc_id").asc_nulls_last()
    )
    lex = lex.select("doc_id", F.row_number().over(wl).alias("rank"))

    e = load_vectors(spark, sf_dir)
    qv = e.filter(F.col("vec_id") == query_vec).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cv = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    vec = brute_force_topk(qv, cv, k=RRF_LIST_K).select(
        F.col("c_id").alias("doc_id"), F.col("rnk").alias("rank")
    )

    return rrf_fuse({"lex": lex, "vec": vec}, k=RRF_K, top_k=RRF_TOP_K)


@query(
    "q_sim_hybrid_rrf2",
    oracle=_hybrid_rrf_oracle(terms=RRF2_QUERY_TERMS, query_vec=RRF2_QUERY_VEC),
    category="similarity",
    description=(
        "Second hybrid-RRF query point (VERDICT r13 item 8): the same "
        "fused kernel as q_sim_hybrid_rrf — bm25_rank / brute_force_topk / "
        "rrf_fuse generics via the shared hybrid_rrf driver — evaluated at "
        "a DIFFERENT fixed lexical query (filter/scan/batch/stream) and a "
        "DIFFERENT dense query point (vec_id=7), guarding the kernel "
        "against point-specific accidental greens. Same scale shape: two "
        "K-row lists fused by an integer full-outer fold."
    ),
    tags=("similarity", "retrieval", "multipoint:hybrid_rrf"),
)
def q_sim_hybrid_rrf2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hybrid_rrf(spark, sf_dir, RRF2_QUERY_TERMS, RRF2_QUERY_VEC)
