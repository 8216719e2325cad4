"""Adversarial heavy-tailed fixture for the dedup family (VERDICT r2 item 6).

The driver fixture's 31-word vocabulary makes every doc pair mid-similar
(SCALE.md "fixture pathologies"), so the strided recall tests there can't
distinguish a well-banded LSH from a lucky one. This module generates a
Zipf-distributed corpus — realistic head-heavy token frequencies, long tail
of rare tokens — with PLANTED near-duplicate clusters, and runs the banded
candidate paths UNSAMPLED against exact brute force on it.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hadoop_web_browsing_logs_spark.operators.dedup import (
    HAMMING_MAX,
    JACCARD_THRESHOLD,
    MINHASH_BANDS,
    MINHASH_PERMS,
    minhash_lsh_pairs,
    minhash_signature,
    simhash_pairs,
    simhash_signatures,
)

N_DOCS = 4000
N_VOCAB = 8000
ZIPF_S = 1.1
N_PLANTED = 300  # base docs that get a near-duplicate variant


def _zipf_corpus(spark):
    """(doc_id, text) corpus: Zipf token draws + planted near-dup variants.

    Variants perturb ~3% of a base doc's token positions, so the pair's
    token-SET Jaccard lands around 0.9-0.97 — right at the threshold the
    banding must not miss. Deterministic (seeded) so failures reproduce.
    """
    rng = np.random.default_rng(42)
    ranks = np.arange(1, N_VOCAB + 1)
    probs = 1.0 / ranks**ZIPF_S
    probs /= probs.sum()

    docs = []
    base_tokens = []
    for i in range(N_DOCS - N_PLANTED):
        length = int(rng.integers(40, 120))
        toks = rng.choice(N_VOCAB, size=length, p=probs)
        base_tokens.append(toks)
        docs.append((i + 1, " ".join(f"w{t}" for t in toks)))
    for j in range(N_PLANTED):
        toks = base_tokens[j].copy()
        n_swap = max(1, int(len(toks) * 0.03))
        pos = rng.choice(len(toks), size=n_swap, replace=False)
        toks[pos] = rng.choice(N_VOCAB, size=n_swap, p=probs)
        docs.append((N_DOCS - N_PLANTED + j + 1, " ".join(f"w{t}" for t in toks)))
    return spark.createDataFrame(docs, "doc_id INT, text STRING")


@pytest.fixture(scope="module")
def zipf_docs(spark):
    # the corpus feeds brute force + two banded paths; compute it once
    return _zipf_corpus(spark).localCheckpoint()


def _brute_force_jaccard_pairs(docs):
    """Exact all-pairs token-set Jaccard at the threshold (int-hashed tokens,
    same trick as the LSH verify stage — cheap integer intersects)."""
    d = docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.filter(F.split(F.trim(F.lower("text")), r"\s+"), lambda x: x != ""),
                lambda tok: F.xxhash64(tok),
            )
        ).alias("toks"),
    )
    a = d.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"))
    b = d.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    jac = inter.cast("double") / (F.size("toks_a") + F.size("toks_b") - inter)
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def test_minhash_lsh_recall_on_zipf_corpus(zipf_docs):
    """Unsampled banded MinHash-LSH vs exact brute force on non-degenerate
    data: recall >= 0.95 at J >= 0.9 (theory: P(band)=0.9^4≈0.66, >= 2 of
    8 bands ≈ 0.997)."""
    brute = {(r.doc_a, r.doc_b) for r in _brute_force_jaccard_pairs(zipf_docs).collect()}
    assert len(brute) >= N_PLANTED * 0.5, f"fixture planted too few truth pairs: {len(brute)}"
    lsh = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(zipf_docs).collect()}
    recall = len(brute & lsh) / len(brute)
    # precision is 1.0 by construction (exact-Jaccard verify stage); recall is
    # the banding's claim
    assert lsh <= brute | lsh  # sanity
    assert all(p in brute for p in lsh), "verify stage emitted a sub-threshold pair"
    assert recall >= 0.95, f"LSH recall {recall:.3f} on Zipf corpus ({len(brute)} truth pairs)"


def test_minhash_bucket_sizes_bounded_on_zipf_corpus(zipf_docs):
    """Bucket-size histogram of the band join on realistic data: the fixture
    corpus's pathological buckets (thousands of docs sharing a band slot) must
    not appear — the largest bucket stays O(cluster size), so the in-bucket
    B² pair blowup is bounded at scale."""
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    d = zipf_docs.select(
        "doc_id",
        minhash_signature(
            F.array_distinct(
                F.filter(F.split(F.trim(F.lower("text")), r"\s+"), lambda x: x != "")
            )
        ).alias("sig"),
    )
    banded = d.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.concat_ws(
                            ",",
                            *[F.element_at("sig", i * rows_per_band + j + 1) for j in range(rows_per_band)],
                        ).alias("slot"),
                    )
                    for i in range(MINHASH_BANDS)
                ]
            )
        ).alias("bs")
    ).select("bs.band", "bs.slot")
    sizes = (
        banded.groupBy("band", "slot")
        .count()
        .groupBy("count")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
        .orderBy("count")
        .collect()
    )
    hist = {int(r["count"]): int(r.n_buckets) for r in sizes}
    print(f"band-bucket size histogram (Zipf corpus): {hist}")
    singletons = hist.get(1, 0)
    total = sum(hist.values())
    # Head-heavy Zipf data DOES produce some large buckets (docs dominated by
    # the ~20 head words collide on a band even at low pairwise Jaccard) —
    # that is real-corpus behavior, not a defect. The scale claim is that the
    # banding bounds the verify workload: Σ C(B,2) in-bucket candidate pairs
    # must stay orders of magnitude below all-pairs n(n-1)/2.
    cand_pairs = sum(b * (b - 1) // 2 * n for b, n in hist.items())
    all_pairs = N_DOCS * (N_DOCS - 1) // 2
    ratio = cand_pairs / all_pairs
    print(f"candidate pairs {cand_pairs} / all-pairs {all_pairs} = {ratio:.4f}")
    assert ratio < 0.02, f"band join generates {ratio:.1%} of all-pairs — banding is not pruning"
    assert singletons / total > 0.85, f"only {singletons}/{total} singleton buckets"


def test_simhash_banding_exact_on_zipf_corpus(zipf_docs):
    """The 4-nibble banding is EXACT for hamming <= 3 by pigeonhole — on any
    corpus. Prove set equality (not just recall) against all-pairs Hamming.

    Runs on a 1200-doc subset: set equality is the claim and corpus size
    doesn't strengthen it, while 16-bit signatures of head-dominated Zipf
    docs concentrate into few nibble buckets (quadratic in-bucket work —
    exactly why the 16-bit demo constant would grow to 64+ bits at scale)."""
    docs = zipf_docs.filter(F.col("doc_id") % 3 == 0)
    sigs = simhash_signatures(docs).select("doc_id", "simhash").localCheckpoint()
    a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"))
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    brute = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= HAMMING_MAX)
        .collect()
    }
    banded = {(r.doc_a, r.doc_b, r.hamming) for r in simhash_pairs(docs, sigs=sigs).collect()}
    assert banded == brute, (
        f"banded={len(banded)} brute={len(brute)} "
        f"missed={len(brute - banded)} extra={len(banded - brute)}"
    )


# ---------------------------------------------------------------------------
# Fuzzy vocabulary join: blocking completeness
# ---------------------------------------------------------------------------


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_vocab_blocking_complete_on_random_vocab(spark):
    """The SymSpell claim the registered oracle proves on fixture data,
    re-proved on a hostile random vocabulary: a small alphabet (pair
    collisions everywhere) and clustered lengths force every edit-distance
    case (substitution/insertion/deletion, doubled letters, shared
    prefixes). The blocked join must equal the naive all-pairs reference
    EXACTLY — no false negatives (the theorem) and no false positives
    (the levenshtein verify)."""
    import random

    from hadoop_web_browsing_logs_spark.operators.dedup import fuzzy_vocab_pairs

    rng = random.Random(42)
    vocab = {"".join(rng.choice("abc") for _ in range(rng.randint(3, 7))) for _ in range(220)}
    expected = sorted(
        (a, b, _levenshtein(a, b))
        for a in vocab
        for b in vocab
        if a < b and _levenshtein(a, b) <= 2
    )
    assert len(expected) > 100, "fixture must actually exercise the blocking"
    got = sorted(
        tuple(r)
        for r in fuzzy_vocab_pairs(
            spark.createDataFrame([(w,) for w in sorted(vocab)], ["term"])
        ).collect()
    )
    assert got == expected


def test_jaccard_prefix_exact_ceil_boundary_pair(spark):
    """Promoted round-14 fuzz shape (docs/fuzz_round14.py jaccard_prefix):
    the fixture that DISCRIMINATES the integer-vs-float prefix-length bug.
    B (9 tokens) is a subset of A (10 tokens): J = 9/10 = tau exactly, so
    the pair MUST be emitted. A's correct prefix length is
    10 - ceil(0.9*10) + 1 = 2 — its df-1 unique token plus the globally
    rarest shared token (which is also B's 1-token prefix). A float ceil
    landing one ulp high (ceil(9.000000000000002) = 10) would shorten A's
    prefix to just the unique token, the prefixes would share nothing, and
    the boundary pair would silently vanish. Exact integer arithmetic on
    tau's Fraction keeps it."""
    from hadoop_web_browsing_logs_spark.operators.dedup import jaccard_prefix_pairs

    shared = [f"s{i}" for i in range(9)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(shared + ["unique_to_a"])),  # |A| = 10
            (2, " ".join(shared)),                    # |B| = 9, B ⊂ A
            # background docs inflate the shared tokens' df so A's unique
            # token is strictly the rarest (prefix slot 1)
            (3, " ".join(shared[:5]) + " filler1 filler2"),
            (4, " ".join(shared[4:]) + " filler3"),
        ],
        ["doc_id", "text"],
    )
    got = [
        (r.doc_a, r.doc_b, r.jaccard)
        for r in jaccard_prefix_pairs(docs, 0.9).collect()
    ]
    assert got == [(1, 2, 0.9)]


def test_jaccard_prefix_threshold_fraction_never_exceeds_double(spark):
    """ADVICE r14 item 2: the candidate stage's rational threshold must
    never exceed the binary double the final `jaccard >= tau` verify
    compares against — for taus whose shortest decimal repr sits ABOVE
    the double (0.7, 0.3, …) the old Fraction(str(tau)) did, a
    theoretical-only under-generation (union sizes ~1e16) now closed by
    _prefix_threshold_fraction's floor fallback."""
    from fractions import Fraction

    from hadoop_web_browsing_logs_spark.operators.dedup import (
        _prefix_threshold_fraction,
    )

    for tau in (0.5, 0.7, 0.8, 0.9, 0.3, 0.66, 1 / 3, 0.875, 0.999999):
        num, den = _prefix_threshold_fraction(tau)
        assert Fraction(num, den) <= Fraction(tau), tau
        # overflow headroom: num * INT_MAX doc size stays far inside BIGINT
        assert num * (2**31) < 2**62, tau
        # short-repr decimal-below-or-equal taus keep the exact
        # pre-round-15 fraction
        if Fraction(str(tau)) <= Fraction(tau) and Fraction(str(tau)).denominator <= 10**6:
            assert (num, den) == (
                Fraction(str(tau)).numerator,
                Fraction(str(tau)).denominator,
            ), tau

    # functional: a decimal-above tau (0.7) still matches the quadratic
    # baseline on a boundary-heavy fixture (J = 7/10 exactly)
    from hadoop_web_browsing_logs_spark.operators.dedup import jaccard_prefix_pairs

    shared = [f"s{i}" for i in range(7)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(shared + ["ua1", "ua2", "ua3"])),  # |A| = 10
            (2, " ".join(shared)),                          # |B| = 7, J = 7/10
            (3, " ".join(shared[:3]) + " f1 f2"),
            (4, " ".join(shared[2:]) + " f3"),
        ],
        ["doc_id", "text"],
    )
    got = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in jaccard_prefix_pairs(docs, 0.7).collect()
    )
    assert (1, 2, 0.7) in got
    # and every emitted pair really clears the float threshold (no
    # over-generation slipped through the verify)
    assert all(j >= 0.7 for _, _, j in got)


def test_jaccard_prefix_positional_filter_prunes_hot_token(spark):
    """Round 15 (VERDICT r14 item 3): the PPJoin positional filter. 40
    boilerplate docs share 8 of their 10 tokens (pair J = 8/12 < 0.8), so
    at tau=0.8 each doc's 3-token prefix reaches one token into the SHARED
    block — without the positional filter that hot token fans out
    40*39/2 = 780 junk candidates. With it every boilerplate row is pruned
    BEFORE the verify join: the shared token sits at prefix position 3 of
    a 10-token doc, so overlap <= 1 + min(10-3, 10-3) = 8 < the required
    ceil(0.8/1.8 * 20) = 9. The one planted true pair (J = 9/11) survives
    through its first common token and the output matches the quadratic
    definition exactly."""
    from hadoop_web_browsing_logs_spark.operators.dedup import (
        _jaccard_prefix_candidates,
        jaccard_prefix_pairs,
    )

    boiler = [f"b{i}" for i in range(8)]
    rows = [
        (i, " ".join(boiler + [f"u{i}a", f"u{i}b"])) for i in range(40)
    ]
    core = [f"p{j}" for j in range(9)]
    rows.append((100, " ".join(core + ["qx"])))   # |A|=10
    rows.append((101, " ".join(core + ["qy"])))   # J = 9/11 ≈ 0.818 >= 0.8
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    cands = _jaccard_prefix_candidates(docs, 0.8)[1].collect()
    # the hot boilerplate token generated ZERO surviving candidates; only
    # the planted pair remains
    assert [(r.doc_a, r.doc_b) for r in cands] == [(100, 101)]

    got = [(r.doc_a, r.doc_b, r.jaccard) for r in jaccard_prefix_pairs(docs, 0.8).collect()]
    assert got == [(100, 101, 9 / 11)]

    # and at tau=0.5 the boilerplate pairs genuinely qualify (J = 2/3):
    # the filter must NOT prune them — candidates == true pairs == 780 + 1
    pairs_05 = jaccard_prefix_pairs(docs, 0.5)
    assert pairs_05.count() == 40 * 39 // 2 + 1
    c05 = _jaccard_prefix_candidates(docs, 0.5)[1].count()
    assert c05 == 40 * 39 // 2 + 1


def test_jaccard_prefix_wide_docs_no_int32_overflow(spark):
    """ADVICE r15 item 1: the decimal-floor fallback (tau=0.7 ->
    699999/1000000) multiplies its num/den literals against int32 `sz`
    columns; before the round-16 LONG widening, num*sz overflowed 32-bit
    at >= ~2148 distinct tokens (ANSI: ARITHMETIC_OVERFLOW at the prefix
    length; non-ANSI: silent wrap dropping qualifying pairs). 3000-token
    docs at tau=0.7 drive num*sz ~= 2.1e9 through the prefix-length, size
    and positional filters; the true boundary pair (J = 2100/3000 = 0.7
    exactly) must come back and the near-miss (J = 2000/3000) must not."""
    from hadoop_web_browsing_logs_spark.operators.dedup import jaccard_prefix_pairs

    wide = [f"w{i:04d}" for i in range(3000)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(wide)),          # |A| = 3000
            (2, " ".join(wide[:2100])),   # B ⊂ A, J = 2100/3000 = 0.7
            (3, " ".join(wide[1000:3000])),  # C ⊂ A, J = 2000/3000 < 0.7
        ],
        ["doc_id", "text"],
    )
    got = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in jaccard_prefix_pairs(docs, 0.7).collect()
    )
    assert got == [(1, 2, 2100 / 3000)]


def test_jaccard_prefix_randomized_boilerplate_skew(spark):
    """Promoted round-15 fuzz family (docs/fuzz_round15.py
    jaccard_prefix_skew, 24/24 ok; VERDICT r15 item 7): randomized
    boilerplate-heavy corpora — a shared token block carried by ~half the
    docs, random unique tails, random near-dup plants — swept across the
    hostile tau set, one seeded trial per tau: the short-prefix regime
    (0.9), the positional-filter regime (0.8, 0.75), both
    decimal-above-float classes (0.7, 0.3 — the _prefix_threshold_fraction
    floor fallback), a binary-exact repeating fraction (2/3), and the
    deep-prefix low tau (0.5). Oracle: an independent pure-Python brute
    force (set Jaccard, float >= tau — exactly the registered final
    filter), checked in BOTH directions: the prefix/size/positional
    filters never prune a qualifying pair, and the verify never leaks an
    extra one."""
    import random

    from hadoop_web_browsing_logs_spark.operators.dedup import jaccard_prefix_pairs

    taus = (0.9, 0.8, 0.75, 0.7, 2 / 3, 0.5, 0.3)
    for t, tau in enumerate(taus):
        rng = random.Random(15100 + t)
        n_boiler_tok = rng.randint(3, 12)
        boiler = [f"b{j}" for j in range(n_boiler_tok)]
        rows, texts = [], {}
        for i in range(rng.randint(20, 50)):
            if rng.random() < 0.5:
                toks = boiler + [f"u{i}x{j}" for j in range(rng.randint(0, 6))]
            else:
                toks = [f"v{i}x{j}" for j in range(rng.randint(1, 12))]
            rng.shuffle(toks)
            texts[i] = toks
            rows.append((i, " ".join(toks)))
        next_id = len(rows)
        for _ in range(rng.randint(1, 5)):
            src_id = rng.randrange(len(texts))
            toks = list(texts[src_id])
            for _ in range(rng.randint(0, 2)):
                if toks and rng.random() < 0.7:
                    toks[rng.randrange(len(toks))] = f"p{next_id}"
                else:
                    toks.append(f"q{next_id}")
            texts[next_id] = toks
            rows.append((next_id, " ".join(toks)))
            next_id += 1

        sets = {i: set(tk) for i, tk in texts.items() if tk}
        want = {
            (a, b)
            for a in sets
            for b in sets
            if a < b
            and len(sets[a] & sets[b])
            and len(sets[a] & sets[b])
            / (len(sets[a]) + len(sets[b]) - len(sets[a] & sets[b]))
            >= tau
        }
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            (r.doc_a, r.doc_b) for r in jaccard_prefix_pairs(docs, tau).collect()
        }
        assert got == want, (
            tau,
            sorted(want - got)[:4],
            sorted(got - want)[:4],
        )
