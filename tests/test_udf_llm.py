"""UDF surface + LLM-pipeline operator tests (DuckDB differentials +
structural properties)."""

from __future__ import annotations

import pytest

from hadoop_web_browsing_logs_spark.plans.registry import all_queries, get_query

from .conftest import SF_DIR, assert_query_matches_oracle


def _oracle_names():
    return sorted(
        n for n, q in all_queries().items() if q.oracle is not None and q.category in ("udf", "llm")
    )


@pytest.mark.parametrize("name", _oracle_names())
def test_matches_duckdb_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name)


def test_chunking_covers_all_tokens(spark):
    """Union of chunks must cover every token; consecutive chunks overlap by
    CHUNK_TOKENS - CHUNK_STRIDE tokens."""
    from pyspark.sql import functions as F

    from hadoop_web_browsing_logs_spark.operators.llm_pipeline import CHUNK_STRIDE, CHUNK_TOKENS
    from hadoop_web_browsing_logs_spark.sources.readers import load_table

    chunks = get_query("q_llm_chunk").fn(spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") % 10 == 0)
    toks = F.filter(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda x: x != "")
    n_tokens = {r.doc_id: r.n for r in docs.select("doc_id", F.size(toks).alias("n")).collect()}

    per_doc = {}
    for r in chunks.collect():
        per_doc.setdefault(r.doc_id, []).append(r)
    assert set(per_doc) == set(n_tokens)
    for doc_id, rows in per_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        # last chunk reaches the final token
        last = rows[-1]
        assert last.chunk_idx * CHUNK_STRIDE + last.n_tokens == n_tokens[doc_id]
        # every chunk except the last is full-width
        assert all(r.n_tokens == CHUNK_TOKENS for r in rows[:-1])


def test_split_fractions_roughly_80_10_10(spark):
    rows = get_query("q_llm_split").fn(spark, SF_DIR).collect()
    totals = {"train": 0, "val": 0, "test": 0}
    for r in rows:
        totals[r.split] += r.n
    n = sum(totals.values())
    assert n == 500
    assert 0.7 <= totals["train"] / n <= 0.9
    assert totals["val"] > 0 and totals["test"] > 0


def test_split_is_deterministic_across_runs(spark):
    a = sorted(tuple(r) for r in get_query("q_llm_split").fn(spark, SF_DIR).collect())
    b = sorted(tuple(r) for r in get_query("q_llm_split").fn(spark, SF_DIR).collect())
    assert a == b


def test_leakage_safe_split_keeps_clusters_together(spark):
    """No near-duplicate cluster may straddle two splits — the property the
    group-keyed hash guarantees and a per-document split violates."""
    import pyspark.sql.functions as F

    from hadoop_web_browsing_logs_spark.operators.dedup import (
        connected_components,
        q_dedup_jaccard_pairs,
    )
    from hadoop_web_browsing_logs_spark.operators.llm_pipeline import _hash_bucket

    from .conftest import SF_DIR

    pairs = q_dedup_jaccard_pairs(spark, SF_DIR).select("doc_a", "doc_b")
    comp = connected_components(pairs)
    b = _hash_bucket(F.col("component").cast("string"), 10)
    split = F.when(b < 8, "train").when(b == 8, "val").otherwise("test")
    spans = (
        comp.select("component", split.alias("split"))
        .groupBy("component")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert spans == 0


def test_decontaminate_broadcast_path_same_result(spark):
    """The bench_is_small=True fast path (forced broadcast for real
    benchmark suites) must produce the identical contamination set as the
    default unhinted join the registered query uses."""
    import pyspark.sql.functions as F

    from hadoop_web_browsing_logs_spark.operators.llm_pipeline import (
        decontaminate,
        shingles_5gram,
    )
    from hadoop_web_browsing_logs_spark.sources.readers import load_table

    from .conftest import SF_DIR

    shingles = shingles_5gram(load_table(spark, SF_DIR, "documents"))
    corpus = shingles.filter(F.col("doc_id") % 97 != 0)
    bench = shingles.filter(F.col("doc_id") % 97 == 0)

    def canon(df):
        return sorted((r.doc_id, r.n_hits) for r in df.collect())

    slow = canon(decontaminate(corpus, bench))
    fast = canon(decontaminate(corpus, bench, bench_is_small=True))
    assert slow == fast and slow


def test_unigram_logprob_properties(spark):
    """Structural invariants of the corpus-LM score: every tokenized doc has
    a strictly negative mean log-prob (probabilities < 1), untokenizable
    docs keep their row with n_tokens=0 and NULL score, and a doc made of
    corpus-frequent tokens outscores one of equally-sized rare tokens."""
    from pyspark.sql import functions as F

    out = get_query("q_llm_unigram_logprob").fn(spark, SF_DIR).cache()
    try:
        assert out.filter("n_tokens > 0 AND (mean_logprob IS NULL OR mean_logprob >= 0)").count() == 0
        assert out.filter("n_tokens = 0 AND mean_logprob IS NOT NULL").count() == 0
        # monotonicity: across docs, higher average corpus-frequency of a
        # doc's tokens must not score lower; check the extremes
        top = out.filter("n_tokens > 0").orderBy(F.col("mean_logprob").desc()).first()
        bot = out.filter("n_tokens > 0").orderBy(F.col("mean_logprob").asc()).first()
        assert top.mean_logprob > bot.mean_logprob
    finally:
        out.unpersist()


def test_shard_manifest_properties(spark):
    """Structural invariants tying the shard manifest to the packing tape:
    shard token counts sum to the corpus total, every shard except possibly
    the last holds >= SHARD_TOKENS (a shard only closes once the tape
    crosses its boundary), doc-id ranges of consecutive shards never
    interleave (the tape is laid in doc_id order), and doc counts sum to
    the corpus cardinality."""
    from hadoop_web_browsing_logs_spark.operators.llm_pipeline import SHARD_TOKENS

    packed = get_query("q_llm_pack_sequences").fn(spark, SF_DIR)
    total_tokens = packed.groupBy().sum("n_tokens").first()[0]
    n_docs = packed.count()

    rows = sorted(
        get_query("q_llm_shard_manifest").fn(spark, SF_DIR).collect(),
        key=lambda r: r.shard_id,
    )
    assert sum(r.n_tokens for r in rows) == total_tokens
    assert sum(r.n_docs for r in rows) == n_docs
    # a shard closes only when the running tape crosses its upper boundary:
    # every shard but the last must carry at least SHARD_TOKENS - (max doc
    # overhang is absorbed by the NEXT shard, so >= SHARD_TOKENS would be
    # wrong; the tight invariant is that the shard's docs START inside it,
    # so cumulative starts are < (shard_id+1)*SHARD_TOKENS). Check instead
    # the exact tape identity: shards are dense from 0 and doc ranges are
    # ordered and disjoint.
    assert rows[0].shard_id == 0
    assert [r.shard_id for r in rows] == list(range(len(rows)))
    for prev, nxt in zip(rows, rows[1:]):
        assert prev.last_doc < nxt.first_doc
        assert prev.first_doc <= prev.last_doc


def test_bigram_logprob_properties(spark):
    """Structural invariants of the bigram-LM score: every bigram carries
    probability <= 1 so mean_logprob is strictly negative wherever defined
    (a doc whose every adjacent pair is unique-in-corpus would score the
    corpus-context log-prob, still < 0 unless its contexts are
    single-occurrence too — allow == 0 only for docs whose every bigram is
    its context's only continuation), n_bigrams ties exactly to the unigram
    scorer's token count (max(n_tokens-1, 0)), and <2-token docs keep a
    NULL-score row."""
    uni = get_query("q_llm_unigram_logprob").fn(spark, SF_DIR).select("doc_id", "n_tokens")
    bi = get_query("q_llm_bigram_logprob").fn(spark, SF_DIR)
    j = bi.join(uni, "doc_id").cache()
    try:
        assert j.filter("n_bigrams != greatest(n_tokens - 1, 0)").count() == 0
        assert j.filter("n_bigrams = 0 AND mean_logprob IS NOT NULL").count() == 0
        assert j.filter("n_bigrams > 0 AND mean_logprob IS NULL").count() == 0
        assert j.filter("mean_logprob > 0").count() == 0
    finally:
        j.unpersist()


def test_weighted_sample_properties(spark):
    """Invariants of the A-ES weighted sampler: at most SAMPLE_K docs per
    stratum, only positive-weight docs are eligible, selection is a strict
    top-K of the deterministic key (no doc outside the sample beats a
    sampled doc's (key, doc_id) rank within its stratum), and the
    length-weighting biases the sample: its mean token count exceeds the
    eligible population's on the fixed md5 draws."""
    import pyspark.sql.functions as F

    from hadoop_web_browsing_logs_spark.operators.llm_pipeline import SAMPLE_K

    samp = get_query("q_llm_weighted_sample").fn(spark, SF_DIR).cache()
    try:
        per = samp.groupBy("source").count()
        assert per.filter(f"count > {SAMPLE_K}").count() == 0
        assert samp.filter("n_tokens <= 0").count() == 0
        s_mean = samp.agg(F.avg("n_tokens")).first()[0]
        uni = get_query("q_llm_unigram_logprob").fn(spark, SF_DIR)
        p_mean = uni.filter("n_tokens > 0").agg(F.avg("n_tokens")).first()[0]
        assert s_mean > p_mean, (s_mean, p_mean)
    finally:
        samp.unpersist()


def test_bpe_golden_classic_corpus(spark):
    """The canonical BPE example (low x5, lower x2, newest x6, widest x3)
    learns the textbook merge sequence: (e,s) wins the 9-way tie
    lexicographically, then (es,t), (est,</w>), then the (l,o)/(o,w) tie
    resolves to (l,o) and cascades to (lo,w) — greedy left-to-right
    application, deterministic count-then-lexicographic argmax."""
    from hadoop_web_browsing_logs_spark.operators.llm_pipeline import (
        bpe_train,
        bpe_word_dict,
    )

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    merges = bpe_train(bpe_word_dict(docs), 5)
    assert [(m[1], m[2], m[3], m[4]) for m in merges] == [
        ("e", "s", "es", 9),
        ("es", "t", "est", 9),
        ("est", "</w>", "est</w>", 9),
        ("l", "o", "lo", 7),
        ("lo", "w", "low", 7),
    ]


def test_bpe_encode_adversarial_merge_tables(spark):
    """Round-13 fuzz promotion (docs/fuzz_round13.py bpe family, 10 trials
    0 failures): the encoder's greedy leftmost fold vs an independent
    scan-and-splice Python encoder on the adversarial merge-table shapes —
    self-merges over runs ('aaaa' + (a,a): pairs merge left-to-right
    without re-scanning the merged product), cascades whose operands are
    products of earlier merges, merges targeting </w>, and rank orders
    where a later merge would have enabled an earlier one (rank order must
    win: the earlier merge does NOT re-fire)."""
    from hadoop_web_browsing_logs_spark.operators.llm_pipeline import (
        BPE_END,
        bpe_encode,
    )

    def apply(syms, l, r):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    def encode(word, merges):
        syms = list(word) + [BPE_END]
        for l, r in merges:
            syms = apply(syms, l, r)
        return syms

    cases = [
        # self-merge over runs: even/odd lengths, then a cascade on the product
        (["aa", "aaa", "aaaa", "aaaaa", "b"], [("a", "a"), ("aa", "aa"), ("aa", "a")]),
        # </w>-targeting + product-of-product cascade
        (["ab", "ba", "abab"], [("a", "b"), ("ab", BPE_END), ("ab", "ab")]),
        # rank order beats enablement: (b,a) fires first, so the 'ab' the
        # rank-2 merge wants never forms in 'aba' — but does in 'aab'
        (["aba", "aab", "ab"], [("b", "a"), ("a", "b")]),
    ]
    for words, merges in cases:
        wdf = spark.createDataFrame([(w,) for w in words], ["word"])
        got = {
            r.word: list(r.syms)
            for r in bpe_encode(wdf, merges=merges, checkpoint_every=2).collect()
        }
        want = {w: encode(w, merges) for w in words}
        assert got == want, (merges, got, want)


def test_pack_sequences_boundary_and_empty_docs(spark, tmp_path):
    """Round-13 fuzz promotion (docs/fuzz_round13.py pack family, 10 trials
    0 failures): the distributed token tape (with_global_cumsum) vs a
    sequential Python fold on the hostile layout — doc_id gaps with shuffled
    insert order, a doc exactly SEQ_LEN tokens long (its successor starts
    exactly on a cut), zero-token docs ON the boundary (the documented
    degenerate: seq_last = seq_first - 1, the doc lands in no sequence),
    and a giant doc spanning several sequences."""
    import duckdb

    from hadoop_web_browsing_logs_spark.operators.llm_pipeline import SEQ_LEN
    from hadoop_web_browsing_logs_spark.plans.registry import get_query

    docs = [
        (3, " ".join(f"a{j}" for j in range(SEQ_LEN)), "en", "s"),  # exact cut
        (7, "", "en", "s"),  # 0 tokens exactly ON a boundary -> last < first
        (10, " ".join(f"b{j}" for j in range(5)), "en", "s"),
        (11, "   ", "en", "s"),  # 0 tokens mid-sequence -> last == first
        (40, " ".join(f"c{j}" for j in range(3 * SEQ_LEN + 1)), "en", "s"),
    ]
    d = str(tmp_path)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO t VALUES (?,?,?,?,?)",
        [r + (len(r[1]),) for r in [docs[4], docs[1], docs[0], docs[3], docs[2]]],
    )
    con.execute(f"COPY t TO '{d}/documents.parquet' (FORMAT PARQUET)")

    got = {
        r.doc_id: (r.n_tokens, r.token_offset, r.seq_first, r.seq_last)
        for r in get_query("q_llm_pack_sequences").fn(spark, d).collect()
    }
    L = SEQ_LEN
    assert got == {
        3: (L, 0, 0, 0),
        7: (0, L, 1, 0),  # boundary degenerate: lands in no sequence
        10: (5, L, 1, 1),
        11: (0, L + 5, 1, 1),  # mid-sequence zero-token doc
        40: (3 * L + 1, L + 5, 1, 4),  # spans sequences 1..4
    }


def test_leakage_safe_split_on_long_near_dup_chain(spark, tmp_path):
    """Round-13 fuzz promotion (docs/fuzz_round13.py leakage family, 8
    trials 0 failures): a 60-doc near-dup CHAIN — sliding 20-token windows
    where consecutive docs hit Jaccard 19/21 ~ 0.905 but i vs i+2 falls to
    0.818 < 0.9 — must split as ONE atomic group. Component diameter 59 is
    the exact class connected_components' pre-round-12 one-hop propagation
    fragmented (it returned 36 components for a 61-chain at max_iter=25);
    a fragmented chain here puts near-dup docs in DIFFERENT splits —
    train/eval leakage, the failure this operator exists to prevent."""
    import hashlib

    import duckdb

    from hadoop_web_browsing_logs_spark.operators.dedup import PAIR_STRIDE
    from hadoop_web_browsing_logs_spark.plans.registry import get_query

    chain_len = 60
    base = [f"w{j}" for j in range(chain_len + 19)]
    rows = [
        (PAIR_STRIDE * (k + 1), " ".join(base[k : k + 20]), "en", "s")
        for k in range(chain_len)
    ]
    rows.append((7, "lone unsampled doc", "en", "s"))  # singleton, unstrided
    d = str(tmp_path)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", [r + (len(r[1]),) for r in rows])
    con.execute(f"COPY t TO '{d}/documents.parquet' (FORMAT PARQUET)")

    got = {
        r.split: (r.n_docs, r.n_groups)
        for r in get_query("q_llm_split_leakage_safe").fn(spark, d).collect()
    }

    def bucket(gid: int) -> str:
        b = int(hashlib.md5(str(gid).encode()).hexdigest()[:4], 16) % 10
        return "train" if b < 8 else ("val" if b == 8 else "test")

    # the whole chain is one group keyed on its min doc_id; the lone doc
    # keys on itself
    chain_split, lone_split = bucket(PAIR_STRIDE), bucket(7)
    want: dict = {}
    for split, docs, groups in ((chain_split, chain_len, 1), (lone_split, 1, 1)):
        nd, ng = want.get(split, (0, 0))
        want[split] = (nd + docs, ng + groups)
    assert got == want
    # the chain landed WHOLE in a single split: no split holds a strict
    # subset of its docs
    assert all(
        nd == chain_len + 1 if s == chain_split == lone_split else True
        for s, (nd, _g) in got.items()
    )


def test_bpe_merges_first_row_is_the_oracled_first_merge(spark):
    """The rows-only iterative loop is gated by its oracled twin: the loop's
    rank-1 merge must equal q_llm_bpe_first_merge's rank-1 candidate (same
    pair, same count), and the merge table is structurally sound (dense
    ranks, merged = left||right, positive counts)."""
    gate = (
        get_query("q_llm_bpe_first_merge").fn(spark, SF_DIR)
        .filter("rank = 1").first()
    )
    rows = sorted(
        get_query("q_llm_bpe_merges").fn(spark, SF_DIR).collect(),
        key=lambda r: r.rank,
    )
    assert (rows[0].left_sym, rows[0].right_sym, rows[0].cnt) == (
        gate.left_sym, gate.right_sym, gate.cnt,
    )
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.merged == r.left_sym + r.right_sym
        assert r.cnt > 0


def test_quality_filter_mix_properties(spark):
    """The quality-filtered mix keeps per source at most
    ceil(n_scoreable * frac) + 1 docs (percent_rank <= 0.5 keeps the top
    half inclusive of the boundary rank), never keeps an unscoreable doc,
    and the kept set's mean LM score strictly exceeds the dropped set's."""
    import math

    import pyspark.sql.functions as F

    from hadoop_web_browsing_logs_spark.operators.llm_pipeline import QUALITY_KEEP_FRAC

    uni = get_query("q_llm_unigram_logprob").fn(spark, SF_DIR).filter("n_tokens > 0")
    kept = get_query("q_llm_quality_filter_mix").fn(spark, SF_DIR).cache()
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "source")
        pop = {r.source: r.n for r in docs.join(uni, "doc_id").groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
        for r in kept.groupBy("source").count().collect():
            assert r["count"] <= math.ceil(pop[r.source] * QUALITY_KEEP_FRAC) + 1, (r.source, r["count"], pop[r.source])
        scored = uni.join(kept.select("doc_id", F.lit(True).alias("k")), "doc_id", "left")
        means = scored.groupBy(F.coalesce("k", F.lit(False)).alias("k")).agg(F.avg("mean_logprob").alias("m")).collect()
        m = {r.k: r.m for r in means}
        assert m[True] > m[False]
    finally:
        kept.unpersist()


def test_temperature_mix_degenerate_corpora(spark, tmp_path):
    """Round 10 (ADVICE r9): corpus shapes the shared fixture cannot
    express. A single-source corpus must yield weight exactly 1 (ppm
    1000000); an ALL-empty corpus makes the quantized denominator exactly
    0, where the engine's try_divide must yield NULL like DuckDB's plain
    division — not an ANSI DIVIDE_BY_ZERO crash. Both corpora are replayed
    differentially against the registered oracle."""
    import duckdb as _duck

    corpora = {
        "single": [
            (1, "alpha beta gamma", "en", "only_src", 16),
            (2, "delta epsilon", "en", "only_src", 13),
        ],
        "all_empty": [
            (1, "   ", "en", "s1", 3),
            (2, "", "en", "s2", 0),
        ],
    }
    for name, rows in corpora.items():
        d = tmp_path / name
        d.mkdir()
        con = _duck.connect()
        vals = ", ".join(
            f"({i}, '{t}', '{lg}', '{s}', {n})" for i, t, lg, s, n in rows
        )
        con.execute(
            f"""COPY (SELECT * FROM (VALUES {vals})
                      AS x(doc_id, text, lang, source, n_chars))
                TO '{d}/documents.parquet' (FORMAT PARQUET)"""
        )
        q = get_query("q_llm_temperature_mix")
        got = {r["source"]: r for r in q.fn(spark, str(d)).collect()}
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        want = {
            r[0]: r for r in con.execute(q.oracle).fetchall()
        }  # source, n_tokens, weight, ppm
        con.close()
        assert set(got) == set(want)
        for src in got:
            assert got[src]["n_tokens"] == want[src][1], src
            assert got[src]["weight"] == want[src][2], src
            assert got[src]["ppm"] == want[src][3], src
        if name == "single":
            # the micro-quantized denominator differs from w_raw by <1e-6
            # relative, so the lone source's weight is 1 up to the grid
            assert abs(got["only_src"]["weight"] - 1.0) < 1e-6
            assert got["only_src"]["ppm"] == 1000000
        else:
            # zero-token sources: w_raw = 0, denom = 0 -> NULL on BOTH
            for src in ("s1", "s2"):
                assert got[src]["n_tokens"] == 0
                assert got[src]["weight"] is None
                assert got[src]["ppm"] is None


def test_contamination_span_islands_math(spark, tmp_path):
    """Constructed spans: a bench doc (id 97, 97 % 97 == 0) donates a
    30-token passage; train docs embed (a) that passage verbatim mid-doc,
    (b) two disjoint 5-token quotes from it, (c) nothing. The islands math
    must report a 26-shingle / 30-token max span for (a), two length-1
    islands (5-token spans) for (b), and no row for (c)."""
    import duckdb

    from hadoop_web_browsing_logs_spark.plans.registry import get_query

    passage = " ".join(f"p{i}" for i in range(30))
    toks = passage.split()
    filler = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))  # noqa: E731
    docs = [
        (97, passage, "en", "bench"),
        (1, f"{filler('a', 8)} {passage} {filler('b', 8)}", "en", "web"),
        # two disjoint 5-token quotes, separated by unseen filler
        (2, f"{' '.join(toks[0:5])} {filler('c', 6)} {' '.join(toks[20:25])}", "en", "web"),
        (3, filler("d", 40), "en", "web"),
    ]
    d = str(tmp_path)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO t VALUES (?,?,?,?,?)", [r + (len(r[1]),) for r in docs]
    )
    con.execute(f"COPY t TO '{d}/documents.parquet' (FORMAT PARQUET)")

    got = {
        r.doc_id: (r.n_hit_positions, r.max_span_shingles, r.max_span_tokens)
        for r in get_query("q_llm_contamination_span").fn(spark, d).collect()
    }
    assert got == {1: (26, 26, 30), 2: (2, 1, 5)}


def test_ngram_run_stats_matches_counter_recount(spark):
    """Round-16 internals pin: q_llm_repetition_rules' per-doc n-gram
    statistics moved from an O(distinct x n) array_distinct + filter-scan
    to ONE run-length fold over the sorted array. The fold's (maxc, dup)
    must equal a brute-force Counter recount — max multiset count and the
    sum of counts >= 2 — on adversarial shapes: all-distinct, all-same, a
    boilerplate-heavy mix, a two-value alternation, and a single element."""
    from collections import Counter

    from hadoop_web_browsing_logs_spark.operators.llm_pipeline import _ngram_run_stats

    cases = [
        [f"d{i}" for i in range(20)],                     # all distinct
        ["same same"] * 17,                               # one hot value
        ["b"] * 9 + [f"u{i}" for i in range(5)] + ["c"] * 2,
        ["x", "y"] * 8,                                   # alternation
        ["only"],                                         # single element
        ["a", "a", "b", "b", "b", "z"],
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], ["i", "g"])
    got = {
        r.i: (r.s.maxc, r.s.dup)
        for r in df.select("i", _ngram_run_stats("g").alias("s")).collect()
    }
    for i, c in enumerate(cases):
        counts = Counter(c)
        want = (max(counts.values()), sum(v for v in counts.values() if v >= 2))
        assert got[i] == want, (i, c, got[i], want)


def test_cogroup_fulfillment_empty_side_buckets():
    """Round-16 internals pin: q_udf_cogrouped_map now cogroups on a hash
    BUCKET, so the pandas function must handle bucket frames the TPC-H
    fixture never produces — an orders-only bucket, a lineitem-only bucket,
    and both-empty — with exact int64 output and full-outer key alignment."""
    import pandas as pd

    from hadoop_web_browsing_logs_spark.operators.udf_surface import (
        _cogroup_fulfillment,
    )

    o = pd.DataFrame({"o_orderkey": [37, 74], "bk": [0, 0]})
    li = pd.DataFrame(
        {
            "l_orderkey": [74, 74, 111],
            "l_extendedprice": [10.01, 0.02, 99999.99],
            "bk": [0, 0, 0],
        }
    )
    out = _cogroup_fulfillment((0,), o, li).set_index("o_orderkey")
    # 37: orders-only; 74: both; 111: lineitem-only
    assert out.loc[37].tolist() == [1, 0, 0]
    assert out.loc[74].tolist() == [1, 2, 1003]
    assert out.loc[111].tolist() == [0, 1, 9999999]
    assert all(str(dt) == "int64" for dt in out.dtypes)

    empty_o = o.iloc[0:0]
    empty_li = li.iloc[0:0]
    assert len(_cogroup_fulfillment((1,), empty_o, empty_li)) == 0
    only_o = _cogroup_fulfillment((2,), o, empty_li).set_index("o_orderkey")
    assert only_o.loc[37].tolist() == [1, 0, 0]
    only_li = _cogroup_fulfillment((3,), empty_o, li).set_index("o_orderkey")
    assert only_li.loc[111].tolist() == [0, 1, 9999999]


def test_cogroup_fulfillment_integer_exact_past_2_53():
    """Round-17 internals pin (ADVICE r16): the full-outer alignment must
    stay in integer dtype end-to-end. The old fillna(0) path widened the
    aligned columns to float64, which silently rounds any cents sum past
    2^53 — feed per-row-exact cents whose SUM exceeds 2^53 and assert the
    output equals the exact Python-int sum of the same per-row floors."""
    import numpy as np
    import pandas as pd

    from hadoop_web_browsing_logs_spark.operators.udf_surface import (
        _cogroup_fulfillment,
    )

    # ~450 rows of ~2e13-cent prices: each row's floor(p*100+0.5) is exact
    # in float64 (< 2^53); the int64 SUM (~9.01e15) is past 2^53, where a
    # float64 round-trip loses low bits
    prices = [2.0e13 + i * 7 + 0.25 for i in range(450)]
    li = pd.DataFrame(
        {
            "l_orderkey": [37] * len(prices),
            "l_extendedprice": prices,
            "bk": [0] * len(prices),
        }
    )
    o = pd.DataFrame({"o_orderkey": [74], "bk": [0]})  # force alignment fill
    want = sum(int(np.floor(p * 100 + 0.5)) for p in prices)
    assert want > 2**53 and float(want) != want, "test must cross 2^53 oddly"
    out = _cogroup_fulfillment((0,), o, li).set_index("o_orderkey")
    assert int(out.loc[37, "ext_cents"]) == want
    assert out.loc[74].tolist() == [1, 0, 0]
    assert all(str(dt) == "int64" for dt in out.dtypes)
