"""Round-13 randomized differential sweep — the shared-derivation family.

Extends the round-12 fuzz-differential program (docs/fuzz_round12b.py,
SCALE.md sweep ledger) to the kernel families VERDICT r12 item 5 ranked
top: kernels whose DuckDB oracles share their DERIVATION with the engine
(a window/arithmetic transliteration of the same rule text), so a
misunderstanding of the rule itself would pass the dual-scale hash gate.
Each target replays the REGISTERED query (or the exact library kernel the
registered query calls) on randomized hostile fixtures against an
INDEPENDENT brute-force Python reference — a different formulation of the
declared semantics, never a transcription of the engine's plan. The
program has form: it found connected_components' one-hop fragmentation in
round 12 after three rounds of green hashes.

Targets:

  pack     q_llm_pack_sequences  vs a Python prefix-sum fold over the
           q_llm_shard_manifest  doc_id-ordered token tape. The engine
                                 side is with_global_cumsum (range-
                                 repartition + per-partition running sums
                                 + broadcast prefix offsets) — exactly the
                                 distributed-vs-sequential derivation gap
                                 the oracle's single SUM() OVER cannot
                                 probe. seq bounds for n>0 docs are
                                 derived INDEPENDENTLY from the token
                                 index range [off, off+n-1] (not the
                                 engine's formulas); n=0 docs pin the
                                 documented degenerate (seq_last <
                                 seq_first — the doc lands in no
                                 sequence). Axes: doc_id gaps, giant
                                 multi-shard docs, empty/whitespace-only
                                 docs, SEQ_LEN-boundary-exact layouts,
                                 single-doc corpora.
  bpe      bpe_encode            vs an independent scan-and-splice greedy
           (the kernel inside    leftmost encoder, on ADVERSARIAL merge
           q_llm_bpe_encode/     tables: self-merges (a,a) over runs of
           _gate)                a, cascades whose left/right are
                                 products of earlier merges, merges
                                 targeting </w>, merges that never fire,
                                 and rank orders where a later merge
                                 would have enabled an earlier one
                                 (rank order must win over re-scan).
  bpe_train bpe_train            vs an independent Python trainer state
           (inside q_llm_bpe_    machine (argmax tie-break, greedy fold,
           merges/_merges_gate)  recount-after-merge interplay — the
                                 overlap-run case 'aaa': (a,a) counts 2,
                                 folds to ['aa','a'], next round sees
                                 (aa,a) once). Axes: 2-char alphabets
                                 (massive ties), run-heavy words, random
                                 freq weights, more merges than the
                                 corpus supports.
  gapfill  q_events_gapfill      vs a Python hourly-bucket + spine +
                                 carry-forward fold (dsum fixed-point
                                 mirrored with int arithmetic). Axes:
                                 multi-hour gaps, single-hour types,
                                 events exactly on hour boundaries,
                                 all-null-value hours (observed but
                                 sum-less: is_gap=0, carry persists),
                                 null ts rows (no spine contribution),
                                 negative values.

  path     q_events_path_mining  vs a per-user sorted triple scan (ties,
                                 30-min boundary hops, top-20 count ties).
  ewma     q_events_ewma         vs a Python float fold of the recurrence
                                 (exact equality — same IEEE ops, same
                                 order; single-hour and null-value axes).
  wsample  q_llm_weighted_sample vs a Python A-ES recount (md5-derived u,
                                 ROUND_HALF_UP fixed point) PLUS the
                                 docstring's equivalence-to-exact-keys
                                 claim, modulo rounded ties at the K edge.
  bm25     q_text_bm25           vs a textbook Okapi recount in Python
                                 (Lucene idf, k1=1.2/b=0.75, micro
                                 rounding, top-20 tie-break) — the kernel
                                 hybrid RRF's lexical leg ranks on.
  leakage  q_llm_split_leakage_  vs exact Jaccard + UNION-FIND + md5
           safe                  buckets, centered on long near-dup
                                 CHAINS (diameter 40-80 — the r12 bug
                                 class) plus incidental-pair and
                                 singleton axes.
  hh       q_agg_heavy_hitters   vs an exact Python count of the declared
                                 output (cnt*80 > N, strict) — any MG
                                 merge/trim bug that drops a true heavy
                                 hitter breaks sketch-independence here.
                                 Axes: 200-600 distinct keys vs the
                                 80-counter budget, boundary counts,
                                 negative floors, NaN/Inf/null exclusion.
  diff     q_snapshot_diff       vs a Python dict diff of the declared
                                 snapshot derivation (null-text md5('')
                                 rule, multi-rule id collisions).
  chunk    q_llm_chunk           vs a Python sliding-window recount
                                 (20/15 windows; one-vs-two-chunk and
                                 exact-fit length boundaries).
  rollup   q_events_rollup_      vs a Python three-grain recount (hour/
           multires              day truncation, epoch//604800 weeks,
                                 dsum cents; null-ts rows label 'week'
                                 in every set -> multiset compare).
  canonical q_dedup_keep_        vs union-find + longest-doc argmax —
           canonical             the components kernel's THIRD consumer
                                 on the chain axis; equal-length
                                 tie-breaks, longest != min-id clusters.
  substring q_dedup_substring    vs a Python rolling-window recount
                                 (intra-doc repeats must NOT flag,
                                 exact-10-token docs, planted cross-doc
                                 passages at different offsets).
  tfidf    q_text_tfidf          vs a textbook recount (df==N -> idf 0,
                                 unrounded ranking vs rounded output,
                                 top-5 term tie-breaks).
  budget   q_llm_token_budget    vs a Python per-source running fold
                                 (exact-2000 boundary, zero-token docs
                                 after the cut, NULL-skipping cumsum).
  tempmix  q_llm_temperature_mix vs a Python n^0.5 recount (micro-grid
                                 denominator, ppm rounding, single/zero/
                                 equal-token and all-null sources).
  int8     q_vec_quantize_int8   vs a numpy/struct float32-faithful
                                 recount (1e-30 scale floor, exact-half
                                 codes, arbitrary dims, NaN/Inf/NULL
                                 exclusion).
  langid   q_text_langid         vs a Python marker-vote recount (cross-
                                 language ambiguous markers force exact
                                 ties -> declaration-order tie-break;
                                 punctuation-attached markers vote for
                                 nothing).
  funnel   q_llm_corpus_funnel   vs a Python stage recount (NULL source
                                 through the null-safe joins, BETWEEN
                                 bounds at 9/10/5000, per-source dedup).
  fuzzy    fuzzy_vocab_pairs     vs a textbook Levenshtein DP cross-join
                                 (transpositions, exactly-ed-2-vs-3,
                                 3/24 length bounds, dense ladders).
  latency  q_events_conversion_  vs a Python first-touch recount
           latency               (purchase AT the first view, purchase-
                                 only users, zero converters; exact
                                 percentiles in the engines' two-product
                                 lerp form — see _pct_linear).
  zscore   q_events_anomaly_     vs a Python integer-cent moment recount
           zscore                (n=1 and zero-variance NULLs, NaN/Inf
                                 skip, NULL-ts hourly group).
  robust   q_events_robust_      vs a Python median/MAD recount
           zscore                (even/odd interpolation, zero-MAD
                                 exclusion, single-row types).
  quality  q_llm_quality_rules   vs a Python Gopher-rule recount (exact
                                 BETWEEN and <= boundaries on double
                                 ratios, empty/null docs, null lang).
  winsorize q_events_winsorize   vs a Python [p05,p99] clamp recount
                                 (single-value/constant types, values AT
                                 the bounds, dsum(4) sums).
  novelty  q_text_novelty        vs a Python trigram-df recount (3-token
                                 docs, intra-doc duplicate shingles,
                                 all-unique and boilerplate corpora,
                                 micro-nat mean log df).
  affinity q_events_type_        vs a Python set-overlap recount
           affinity              (disjoint bases emit NO row, identical
                                 bases jaccard 1.0, repeats distinct-ed).
  welch    q_events_ab_welch     vs a Python moment recount with the
                                 try_divide NULL rules (empty/single/
                                 zero-variance cohorts, GREATEST clamp).
  spearman q_events_spearman     vs a Python fractional-rank recount
                                 (heavy ties, constant series -> NULL,
                                 monotone pairs, single-shared-hour).
  lm       q_llm_unigram_logprob vs Python corpus-LM recounts (micro-nat
           q_llm_bigram_logprob  dsums; single-token docs -> 0 bigrams
                                 NULL score, whole-corpus duplicates ->
                                 exactly 0, word-salad ordering).
  split    q_llm_split           vs a Python hashlib recount of the
                                 md5-prefix 80/10/10 rule (null text,
                                 duplicate texts, null lang).

Run:  python docs/fuzz_round13.py
      [pack|bpe|bpe_train|gapfill|path|ewma|wsample|bm25|leakage|hh|
       diff|chunk|rollup|canonical|substring|tfidf|budget|tempmix|int8|
       langid|funnel|fuzzy|latency|zscore|robust|quality|winsorize|novelty|
       affinity|welch|spearman|lm|split|all]

Results land in SCALE.md's sweep ledger; canonical hostile shapes get
promoted to committed regression tests.
"""

from __future__ import annotations

import random
import sys
import tempfile
from datetime import datetime, timedelta

import duckdb

sys.path.insert(0, ".")

from hadoop_web_browsing_logs_spark.plans.registry import get_query
from hadoop_web_browsing_logs_spark.session import get_spark

BASE = datetime(2024, 1, 1)


def _write_documents(rows) -> str:
    """rows: (doc_id, text|None, lang, source)."""
    d = tempfile.mkdtemp(prefix="fuzz13_docs_")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO t VALUES (?,?,?,?,?)",
        [r + (len(r[1]) if r[1] is not None else 0,) for r in rows],
    )
    con.execute(f"COPY t TO '{d}/documents.parquet' (FORMAT PARQUET)")
    return d


def _write_events(rows) -> str:
    """rows: (event_id, ts|None, user_id, event_type, value|None)."""
    d = tempfile.mkdtemp(prefix="fuzz13_events_")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany("INSERT INTO e VALUES (?,?,?,?,?,?)", [r + (None,) for r in rows])
    con.execute(f"COPY e TO '{d}/events.parquet' (FORMAT PARQUET)")
    return d


def _tokens(text: str | None) -> list[str]:
    if text is None:
        return []
    return [w for w in text.lower().strip().split() if w]


# ---------------------------------------------------------------------------
# pack: q_llm_pack_sequences + q_llm_shard_manifest vs a sequential fold
# ---------------------------------------------------------------------------


def fuzz_pack(spark, trials: int = 10) -> int:
    from hadoop_web_browsing_logs_spark.operators.llm_pipeline import (
        SEQ_LEN,
        SHARD_TOKENS,
    )

    q_pack = get_query("q_llm_pack_sequences").fn
    q_shard = get_query("q_llm_shard_manifest").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(13000 + t)
        hostile = t % 2 == 0
        n = rng.randint(1, 120)
        rows = []
        # non-contiguous, shuffled-insert doc ids: the tape order is BY
        # doc_id, not by parquet row order
        ids = rng.sample(range(0, 10 * n), n)
        for i in ids:
            r = rng.random()
            if hostile and r < 0.12:
                text = rng.choice(["", "   ", "\t\n  "])  # 0 tokens
            elif hostile and r < 0.3:
                # boundary-exact: token count a multiple of SEQ_LEN
                text = " ".join(f"w{j}" for j in range(SEQ_LEN * rng.randint(1, 3)))
            elif hostile and r < 0.38:
                # giant doc spanning several shards
                text = " ".join(f"g{j}" for j in range(rng.randint(1200, 3000)))
            else:
                text = " ".join(f"t{j}" for j in range(rng.randint(1, 40)))
            rows.append((i, text, "en", "s"))
        rng.shuffle(rows)
        d = _write_documents(rows)

        got_pack = {
            r.doc_id: (r.n_tokens, r.token_offset, r.seq_first, r.seq_last)
            for r in q_pack(spark, d).collect()
        }
        got_shard = {
            r.shard_id: (r.n_docs, r.n_tokens, r.first_doc, r.last_doc)
            for r in q_shard(spark, d).collect()
        }

        # independent sequential fold over the doc_id-ordered tape
        want_pack = {}
        cum = 0
        for doc_id, text, _l, _s in sorted(rows):
            ntok = len(_tokens(text))
            off = cum
            cum += ntok
            if ntok > 0:
                # derived from the token index range, not the engine formula
                first = off // SEQ_LEN
                last = (off + ntok - 1) // SEQ_LEN
            else:
                # documented degenerate: lands in no sequence; the published
                # formulas give seq_last = (off-1)//SEQ_LEN (< seq_first at
                # boundaries, == otherwise)
                first = off // SEQ_LEN
                last = (off - 1) // SEQ_LEN
            want_pack[doc_id] = (ntok, off, first, last)
        want_shard: dict = {}
        for doc_id, (ntok, off, _f, _l2) in want_pack.items():
            sid = off // SHARD_TOKENS
            nd, nt, fd, ld = want_shard.get(sid, (0, 0, doc_id, doc_id))
            want_shard[sid] = (
                nd + 1,
                nt + ntok,
                min(fd, doc_id),
                max(ld, doc_id),
            )
        if got_pack != want_pack or got_shard != want_shard:
            fails += 1
            pk = {k for k in set(got_pack) | set(want_pack) if got_pack.get(k) != want_pack.get(k)}
            sk = {k for k in set(got_shard) | set(want_shard) if got_shard.get(k) != want_shard.get(k)}
            print(f"  pack trial {t}: MISMATCH pack_keys={sorted(pk)[:5]} shard_keys={sorted(sk)[:5]}")
            for k in sorted(pk)[:3]:
                print(f"    doc {k}: engine={got_pack.get(k)} brute={want_pack.get(k)}")
            for k in sorted(sk)[:3]:
                print(f"    shard {k}: engine={got_shard.get(k)} brute={want_shard.get(k)}")
    return fails


# ---------------------------------------------------------------------------
# bpe: bpe_encode on adversarial merge tables vs scan-and-splice encoder
# ---------------------------------------------------------------------------


def _py_bpe_apply(syms: list[str], left: str, right: str) -> list[str]:
    """One greedy leftmost pass: scan left to right, merge each (left,right)
    adjacency, continue AFTER the merged token ('aaa' + (a,a) -> ['aa','a']).
    A different formulation from the engine's aggregate-pend fold."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_bpe_encode(word: str, merges) -> list[str]:
    from hadoop_web_browsing_logs_spark.operators.llm_pipeline import BPE_END

    syms = list(word) + [BPE_END]
    for l, r in merges:
        syms = _py_bpe_apply(syms, l, r)
    return syms


def _rand_merge_table(rng: random.Random, alphabet: list[str], k: int):
    """Adversarial merge table: left/right drawn from the REACHABLE symbol
    set (base chars + </w> + products of earlier merges), biased toward
    self-merges, </w>-targeting merges, and cascades."""
    from hadoop_web_browsing_logs_spark.operators.llm_pipeline import BPE_END

    reachable = list(alphabet) + [BPE_END]
    merges = []
    for _ in range(k):
        r = rng.random()
        if r < 0.25:
            a = rng.choice(alphabet)
            pair = (a, a)  # self-merge over runs
        elif r < 0.45 and merges:
            prod = rng.choice(merges)
            pair = (prod[0] + prod[1], rng.choice(reachable))  # cascade
        elif r < 0.6:
            pair = (rng.choice(reachable), BPE_END)
        else:
            pair = (rng.choice(reachable), rng.choice(reachable))
        merges.append(pair)
        reachable.append(pair[0] + pair[1])
    return merges


def fuzz_bpe(spark, trials: int = 10) -> int:
    from hadoop_web_browsing_logs_spark.operators.llm_pipeline import bpe_encode

    fails = 0
    for t in range(trials):
        rng = random.Random(14000 + t)
        alphabet = list("ab") if t % 2 == 0 else list("abc")
        merges = _rand_merge_table(rng, alphabet, rng.randint(1, 10))
        words = set()
        for _ in range(rng.randint(3, 25)):
            words.add("".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12))))
        # runs of a single char stress self-merges
        words.add("a" * rng.randint(2, 9))
        words = sorted(words)
        wdf = spark.createDataFrame([(w,) for w in words], ["word"])
        got = {
            r.word: list(r.syms)
            for r in bpe_encode(wdf, merges=merges, checkpoint_every=4).collect()
        }
        want = {w: _py_bpe_encode(w, merges) for w in words}
        if got != want:
            fails += 1
            bad = [w for w in words if got.get(w) != want.get(w)]
            print(f"  bpe trial {t}: MISMATCH merges={merges}")
            for w in bad[:3]:
                print(f"    {w!r}: engine={got.get(w)} brute={want.get(w)}")
    return fails


def fuzz_bpe_train(spark, trials: int = 8) -> int:
    """bpe_train (iterate: global pair argmax -> greedy fold -> recount) vs
    an independent Python trainer. The pair COUNT derivation is necessarily
    the same rule (positional adjacent pairs, overlapping runs count every
    position), but the iteration state machine — argmax tie-break
    (cnt DESC, lexicographic left then right), the fold, and the
    recount-after-merge interplay (e.g. 'aaa' counts (a,a) twice but folds
    to ['aa','a'], so the NEXT round sees (aa,a) once) — is re-implemented
    from the docstring. Axes: 2-char alphabets (massive ties), run-heavy
    words, random frequency weights, more merges than the corpus supports
    (early-exhaustion break)."""
    from hadoop_web_browsing_logs_spark.operators.llm_pipeline import (
        BPE_END,
        bpe_train,
        bpe_word_dict,
    )

    fails = 0
    for t in range(trials):
        rng = random.Random(16000 + t)
        alphabet = list("ab") if t % 2 == 0 else list("abc")
        words = {}
        for _ in range(rng.randint(2, 15)):
            w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
            words[w] = words.get(w, 0) + rng.randint(1, 9)
        words["a" * rng.randint(3, 7)] = rng.randint(1, 9)  # run-heavy
        text = " ".join(
            w for w, f in sorted(words.items()) for _ in range(f)
        )
        docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        n_merges = rng.randint(1, 8)
        got = bpe_train(bpe_word_dict(docs), n_merges)

        cur = [(list(w) + [BPE_END], f) for w, f in sorted(words.items())]
        want = []
        for rank in range(1, n_merges + 1):
            counts: dict = {}
            for syms, f in cur:
                for i in range(len(syms) - 1):
                    k = (syms[i], syms[i + 1])
                    counts[k] = counts.get(k, 0) + f
            if not counts:
                break
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
            want.append((rank, best[0], best[1], best[0] + best[1], counts[best]))
            cur = [(_py_bpe_apply(syms, *best), f) for syms, f in cur]
        got_t = [tuple(m) for m in got]
        if got_t != want:
            fails += 1
            print(f"  bpe_train trial {t}: MISMATCH words={words}")
            print(f"    engine={got_t}\n    brute={want}")
    return fails


# ---------------------------------------------------------------------------
# gapfill: q_events_gapfill vs a Python spine + carry-forward fold
# ---------------------------------------------------------------------------


def fuzz_gapfill(spark, trials: int = 10) -> int:
    q = get_query("q_events_gapfill").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(15000 + t)
        hostile = t % 2 == 0
        types = ["view", "purchase"] if hostile else ["view", "purchase", "click"]
        rows = []
        for i in range(rng.randint(2, 120)):
            et = rng.choice(types)
            if hostile:
                # sparse multi-hour gaps + exact hour boundaries
                h = rng.choice([0, 1, 2, 7, 8, 30, 31])
                mins = rng.choice([0, 1, 59])  # 0 = exactly on the boundary
            else:
                h = rng.randint(0, 12)
                mins = rng.randint(0, 59)
            ts = BASE + timedelta(hours=h, minutes=mins)
            if hostile and rng.random() < 0.05:
                ts = None  # no spine contribution, no hourly row that joins
            val = round(rng.uniform(-50, 50), 2)
            if hostile and rng.random() < 0.1:
                val = None  # hour can be observed yet sum-less
            rows.append((i, ts, rng.randint(1, 5), et, val))
        d = _write_events(rows)
        got = {
            (r.event_type, r.hour, r.n_events, r.is_gap, r.filled_sum)
            for r in q(spark, d).collect()
        }

        # brute force: hourly buckets -> spine -> carry-forward
        hourly: dict = {}
        for _i, ts, _u, et, val in rows:
            if ts is None:
                continue
            h = ts.replace(minute=0, second=0, microsecond=0)
            cnt, micro, has = hourly.get((et, h), (0, 0, False))
            if val is not None:
                micro += int(round(val * 100))
                has = True
            hourly[(et, h)] = (cnt + 1, micro, has)
        want = set()
        for et in {k[0] for k in hourly}:
            hs = sorted(h for (e, h) in hourly if e == et)
            carry = None
            h = hs[0]
            while h <= hs[-1]:
                cnt, micro, has = hourly.get((et, h), (0, 0, False))
                obs = (et, h) in hourly
                if obs and has:
                    carry = micro / 100
                want.add((et, h, cnt if obs else 0, 0 if obs else 1, carry))
                h += timedelta(hours=1)
        if got != want:
            fails += 1
            print(
                f"  gapfill trial {t}: MISMATCH\n    only-engine={sorted(got - want)[:4]}"
                f"\n    only-brute={sorted(want - got)[:4]}"
            )
    return fails


# ---------------------------------------------------------------------------
# path: q_events_path_mining vs a per-user sorted triple scan
# ---------------------------------------------------------------------------


def fuzz_path(spark, trials: int = 10) -> int:
    """q_events_path_mining (two lags on one user window + hash agg +
    TakeOrdered) vs an independent per-user sorted-list TRIPLE SCAN. Axes:
    equal timestamps (tie by event_id), hops exactly AT the 30-min session
    boundary (inclusive), users with < 3 events, null ts / event_type rows
    (excluded by contract), >20 distinct paths with count ties at the
    top-20 boundary."""
    q = get_query("q_events_path_mining").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(17000 + t)
        hostile = t % 2 == 0
        types = list("ABCD") if hostile else ["view", "click", "purchase", "search", "login"]
        rows = []
        for i in range(rng.randint(3, 150)):
            if hostile:
                # tiny grid: exact ties and exact 30-min hops abound
                ts = BASE + timedelta(minutes=rng.choice([0, 0, 30, 30, 60, 90, 91]))
            else:
                ts = BASE + timedelta(minutes=rng.randint(0, 600))
            et = rng.choice(types)
            if hostile and rng.random() < 0.05:
                ts = None
            if hostile and rng.random() < 0.05:
                et = None
            rows.append((i, ts, rng.randint(1, 4 if hostile else 12), et, 1.0))
        d = _write_events(rows)
        got = [(r.rank, r.path, r.cnt) for r in q(spark, d).collect()]

        byu: dict = {}
        for eid, ts, uid, et, _v in rows:
            if ts is None or et is None:
                continue
            byu.setdefault(uid, []).append((ts, eid, et))
        cnt: dict = {}
        lim = timedelta(minutes=30)
        for evs in byu.values():
            evs.sort()
            for j in range(2, len(evs)):
                (ts2, _e2, t2), (ts1, _e1, t1), (ts0, _e0, t0) = evs[j - 2], evs[j - 1], evs[j]
                if ts1 >= ts0 - lim and ts2 >= ts1 - lim:
                    p = f"{t2}>{t1}>{t0}"
                    cnt[p] = cnt.get(p, 0) + 1
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        want = [(r + 1, p, c) for r, (p, c) in enumerate(ranked)]
        if got != want:
            fails += 1
            print(f"  path trial {t}: MISMATCH\n    engine={got[:6]}\n    brute={want[:6]}")
    return fails


# ---------------------------------------------------------------------------
# ewma: q_events_ewma vs a Python per-type fold over the hour-sorted series
# ---------------------------------------------------------------------------


def fuzz_ewma(spark, trials: int = 10) -> int:
    """q_events_ewma (seed-with-first aggregate() fold over the collected
    hour-sorted value array) vs a Python float fold of the declared
    recurrence ewma = 0.25*x + 0.75*acc — same IEEE ops in the same order,
    so equality is exact, no tolerance. Axes: single-hour types (fold over
    an empty tail — seed only), all-null-value hours (dsum -> NULL ->
    dropped from the series), negative values, insertion order shuffled
    against hour order."""
    q = get_query("q_events_ewma").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(18000 + t)
        hostile = t % 2 == 0
        types = ["a", "b", "c"]
        rows = []
        for i in range(rng.randint(2, 120)):
            et = rng.choice(types)
            h = rng.randint(0, 3 if hostile else 20)
            ts = BASE + timedelta(hours=h, minutes=rng.randint(0, 59))
            val = round(rng.uniform(-40, 40), 2)
            if hostile and rng.random() < 0.12:
                val = None
            if hostile and rng.random() < 0.05:
                ts = None
            rows.append((i, ts, rng.randint(1, 5), et, val))
        rng.shuffle(rows)
        rows = [(i,) + r[1:] for i, r in enumerate(rows)]
        d = _write_events(rows)
        got = {
            r.event_type: (r.n_hours, r.last_v, r.ewma)
            for r in q(spark, d).collect()
        }

        hourly: dict = {}
        for _i, ts, _u, et, val in rows:
            if ts is None:
                continue
            h = ts.replace(minute=0, second=0, microsecond=0)
            micro, has = hourly.get((et, h), (0, False))
            if val is not None:
                micro += int(round(val * 100))
                has = True
            hourly[(et, h)] = (micro, has)
        want = {}
        for et in {k[0] for k in hourly}:
            series = [
                micro / 100
                for h, (micro, has) in sorted(
                    (h, v) for (e, h), v in hourly.items() if e == et
                )
                if has
            ]
            if not series:
                continue
            acc = series[0]
            for x in series[1:]:
                acc = 0.25 * x + 0.75 * acc
            want[et] = (len(series), series[-1], acc)
        if got != want:
            fails += 1
            bad = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
            print(f"  ewma trial {t}: MISMATCH {[(k, got.get(k), want.get(k)) for k in sorted(bad)][:3]}")
    return fails


# ---------------------------------------------------------------------------
# wsample: q_llm_weighted_sample vs a Python A-ES recount + exact-key check
# ---------------------------------------------------------------------------


def fuzz_wsample(spark, trials: int = 8) -> int:
    """q_llm_weighted_sample vs (1) a Python recount of the declared
    derandomized A-ES rule — u from the first 8 md5 hex chars of the text,
    key_micro = ROUND_HALF_UP(ln((h+1)/2^32)/n_tokens * 1e6), top SAMPLE_K
    per source by (key_micro DESC, doc_id) — and (2) the EQUIVALENCE claim
    the docstring makes: the selected set per source must be the top-K
    under the exact (unrounded) ln(u)/w key too, except for docs whose
    rounded key ties at the K boundary. Axes: duplicate texts (identical
    u), single-token docs (extreme weights), zero-token docs (excluded),
    sources with fewer than K eligible docs."""
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from hadoop_web_browsing_logs_spark.operators.llm_pipeline import SAMPLE_K

    q = get_query("q_llm_weighted_sample").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(19000 + t)
        hostile = t % 2 == 0
        rows = []
        texts = [" ".join(f"w{j}" for j in range(rng.randint(1, 30))) for _ in range(6)]
        for i in range(rng.randint(4, 120)):
            if hostile and rng.random() < 0.2:
                text = rng.choice(texts)  # duplicate texts: identical u
            elif hostile and rng.random() < 0.1:
                text = ""  # zero tokens: excluded
            elif hostile and rng.random() < 0.15:
                text = "solo"  # single-token: extreme weight
            else:
                text = " ".join(f"x{rng.randint(0, 50)}" for _ in range(rng.randint(1, 40)))
            rows.append((i, text, "en", rng.choice(["s1", "s2"] if hostile else ["s1", "s2", "s3"])))
        d = _write_documents(rows)
        got = {
            (r.source, r.doc_id): (r.n_tokens, r.key_micro)
            for r in q(spark, d).collect()
        }

        cand: dict = {}
        exact: dict = {}
        for doc_id, text, _l, src in rows:
            ntok = len(_tokens(text))
            if ntok <= 0:
                continue
            h = int(hashlib.md5((text or "").encode()).hexdigest()[:8], 16)
            key = math.log((h + 1) / 4294967296.0) / ntok
            km = int(
                Decimal(key * 1000000).quantize(Decimal(1), rounding=ROUND_HALF_UP)
            )
            cand.setdefault(src, []).append((km, doc_id, ntok))
            exact.setdefault(src, []).append((key, doc_id))
        want = {}
        for src, lst in cand.items():
            lst.sort(key=lambda r: (-r[0], r[1]))
            for km, doc_id, ntok in lst[:SAMPLE_K]:
                want[(src, doc_id)] = (ntok, km)
        if got != want:
            fails += 1
            bad = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
            print(f"  wsample trial {t}: MISMATCH {[(k, got.get(k), want.get(k)) for k in sorted(bad)][:4]}")
            continue
        # equivalence to the exact-key A-ES ranking, modulo boundary ties
        for src, lst in exact.items():
            lst.sort(key=lambda r: (-r[0], r[1]))
            exact_top = {doc_id for _k, doc_id in lst[:SAMPLE_K]}
            chosen = {doc_id for (s, doc_id) in want if s == src}
            diff = exact_top ^ chosen
            if diff:
                kms = {doc_id: km for km, doc_id, _n in cand[src]}
                boundary = sorted(cand[src], key=lambda r: (-r[0], r[1]))
                if len(boundary) > SAMPLE_K:
                    edge = boundary[SAMPLE_K - 1][0]
                    if all(kms[d] == edge for d in diff):
                        continue  # rounded-key tie at the K boundary: allowed
                fails += 1
                print(f"  wsample trial {t}: EXACT-KEY DIVERGENCE src={src} diff={sorted(diff)[:4]}")
    return fails


# ---------------------------------------------------------------------------
# bm25: q_text_bm25 vs a textbook Okapi recount (feeds hybrid RRF's lex leg)
# ---------------------------------------------------------------------------


def fuzz_bm25(spark, trials: int = 8) -> int:
    """q_text_bm25 (one-pass conditional-count aggregation + df cascade +
    TakeOrdered) vs a textbook per-doc Okapi BM25 recount in Python:
    k1=1.2, b=0.75, Lucene idf ln(1+(N-df+0.5)/(df+0.5)), avgdl = corpus
    tokens / ALL docs (empty docs count in N), micro = ROUND_HALF_UP of
    the double product, per-doc sum over present query terms, top-20 by
    (micro DESC, doc_id). Axes: punctuation-attached query terms (the
    \\p{{P}} strip must fire before matching), repeated query terms (tf),
    duplicate docs (micro ties at the top-20 boundary -> doc_id
    tie-break), empty docs (count in N, absent from dl), docs with zero
    query terms (no row)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from hadoop_web_browsing_logs_spark.operators.text import (
        BM25_QUERY_TERMS,
        BM25_TOP_K,
    )

    q = get_query("q_text_bm25").fn
    PUNCT = set(".,!?-;:'\"()")
    fails = 0
    for t in range(trials):
        rng = random.Random(20000 + t)
        hostile = t % 2 == 0
        filler = [f"f{j}" for j in range(8 if hostile else 60)]
        rows = []
        dup_pool = []
        for i in range(rng.randint(5, 140)):
            r = rng.random()
            if hostile and r < 0.1:
                text = ""  # counts in N, no tokens
            elif hostile and r < 0.25 and dup_pool:
                text = rng.choice(dup_pool)  # exact dup: micro tie
            else:
                words = []
                for _ in range(rng.randint(1, 30)):
                    if rng.random() < 0.3:
                        w = rng.choice(BM25_QUERY_TERMS)
                        if hostile and rng.random() < 0.4:
                            w = w + rng.choice([".", ",", "!", "?"])  # punct-attached
                    else:
                        w = rng.choice(filler)
                    words.append(w)
                text = " ".join(words)
                dup_pool.append(text)
            rows.append((i, text, "en", "s"))
        d = _write_documents(rows)
        got = [(r.doc_id, r.n_terms, r.bm25) for r in q(spark, d).collect()]

        def toks(text):
            out = []
            for w in text.lower().strip().split():
                w = "".join(c for c in w if c not in PUNCT)
                if w:
                    out.append(w)
            return out

        tk = {i: toks(text) for i, text, _l, _s in rows}
        N = float(len(rows))
        tot = float(sum(len(v) for v in tk.values()))
        df = {
            term: sum(1 for v in tk.values() if term in v)
            for term in BM25_QUERY_TERMS
        }
        scored = []
        for i, v in tk.items():
            dl = len(v)
            micro = 0
            n_terms = 0
            for term in BM25_QUERY_TERMS:
                tf = v.count(term)
                if tf == 0:
                    continue
                n_terms += 1
                x = (
                    math.log(1 + (N - df[term] + 0.5) / (df[term] + 0.5))
                    * (tf * 2.2)
                    / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / (tot / N)))
                    * 1000000
                )
                micro += int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))
            if n_terms:
                scored.append((i, n_terms, micro))
        scored.sort(key=lambda r: (-r[2], r[0]))
        want = [(i, n, m / 1000000) for i, n, m in scored[:BM25_TOP_K]]
        if got != want:
            fails += 1
            diffs = [(a, b) for a, b in zip(got, want) if a != b]
            print(f"  bm25 trial {t}: MISMATCH first={diffs[:3]} len(got)={len(got)} len(want)={len(want)}")
    return fails


# ---------------------------------------------------------------------------
# leakage: q_llm_split_leakage_safe vs union-find + md5 buckets, on CHAINS
# ---------------------------------------------------------------------------


def fuzz_leakage(spark, trials: int = 8) -> int:
    """q_llm_split_leakage_safe (Jaccard pairs -> connected_components ->
    group-keyed md5 split) vs an independent Python pipeline: exact Jaccard
    over the strided universe, UNION-FIND components (not pointer-jumping),
    min-member group ids, md5-prefix buckets. The centerpiece axis is LONG
    NEAR-DUP CHAINS — sliding 20-token windows where consecutive docs hit
    Jaccard 19/21 ~ 0.905 but doc i vs i+2 falls to 0.818 < 0.9 — building
    components of diameter 40-80: exactly the class whose one-hop
    propagation bug survived 9 rounds until the round-12 union-find fuzz.
    Other axes: tiny-vocab incidental pairs, empty/whitespace docs
    (excluded from pairing, singleton groups), non-strided doc ids
    (singletons by construction)."""
    import hashlib

    from hadoop_web_browsing_logs_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        PAIR_STRIDE,
    )

    q = get_query("q_llm_split_leakage_safe").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(21000 + t)
        hostile = t % 2 == 0
        rows = []
        next_id = 0

        def take_id(strided: bool):
            nonlocal next_id
            next_id += PAIR_STRIDE if strided else 1
            if strided and next_id % PAIR_STRIDE != 0:
                next_id += PAIR_STRIDE - (next_id % PAIR_STRIDE)
            return next_id

        # the chain: diameter >> 25
        chain_len = rng.randint(40, 80) if hostile else rng.randint(3, 10)
        base = [f"c{t}w{j}" for j in range(chain_len + 19)]
        for k in range(chain_len):
            rows.append((take_id(True), " ".join(base[k : k + 20]), "en", "s"))
        # random tail: tiny vocab for incidental pairs + empties + unsampled
        vocab = [f"v{j}" for j in range(4)]
        for _ in range(rng.randint(0, 40)):
            strided = rng.random() < 0.5
            txt = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12)))
            if hostile and rng.random() < 0.1:
                txt = "  "
            rows.append((take_id(strided), txt, "en", "s"))
        d = _write_documents(rows)
        got = {(r.split): (r.n_docs, r.n_groups) for r in q(spark, d).collect()}

        # brute force: exact pairs over the strided universe -> union-find
        toks = {
            i: set(_tokens(txt))
            for i, txt, _l, _s in rows
            if i % PAIR_STRIDE == 0 and _tokens(txt)
        }
        parent = {i: i for i in toks}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ids = sorted(toks)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                inter = len(toks[a] & toks[b])
                if inter / (len(toks[a]) + len(toks[b]) - inter) >= JACCARD_THRESHOLD:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        # min-member component id per node (only nodes that appear in a pair
        # get a component row in the engine; others fall back to doc_id —
        # min-member == own id for singletons either way)
        comp = {}
        for i in toks:
            r = find(i)
            comp.setdefault(r, []).append(i)
        gid_of = {}
        for r, members in comp.items():
            g = min(members)
            for m in members:
                gid_of[m] = g
        want: dict = {}
        for i, _txt, _l, _s in rows:
            gid = gid_of.get(i, i)
            b = int(hashlib.md5(str(gid).encode()).hexdigest()[:4], 16) % 10
            split = "train" if b < 8 else ("val" if b == 8 else "test")
            nd, groups = want.get(split, (0, set()))
            groups.add(gid)
            want[split] = (nd + 1, groups)
        want = {s: (nd, len(g)) for s, (nd, g) in want.items()}
        if got != want:
            fails += 1
            print(f"  leakage trial {t}: MISMATCH chain={chain_len}\n    engine={got}\n    brute={want}")
    return fails


# ---------------------------------------------------------------------------
# hh: q_agg_heavy_hitters vs an exact Python count (sketch-independence)
# ---------------------------------------------------------------------------


def fuzz_hh(spark, trials: int = 8) -> int:
    """q_agg_heavy_hitters (per-partition Misra-Gries partials -> mergeable
    reduction -> candidate trim -> exact verify) vs a plain Python exact
    count of the DECLARED output: every floor(value) key with
    cnt * 80 > N, (cnt DESC, bucket) ordered. The output must be
    sketch-independent — any MG merge/trim bug that drops a true heavy
    hitter breaks the superset guarantee and shows here. Axes: >80x the
    counter budget in distinct keys, keys exactly AT the N/80 boundary
    (strict >), near-boundary ±1 counts, negative values (floor toward
    -inf), NaN/±Inf/null excluded, single dominant key."""
    import math

    from hadoop_web_browsing_logs_spark.operators.skew import HH_K

    q = get_query("q_agg_heavy_hitters").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(22000 + t)
        hostile = t % 2 == 0
        rows = []
        i = 0

        def add(v, times=1):
            nonlocal i
            for _ in range(times):
                rows.append((i, BASE, rng.randint(1, 9), "view", v))
                i += 1

        if hostile:
            # many distinct keys (>> the 80-counter budget) + boundary keys
            for k in range(rng.randint(200, 600)):
                add(float(k) + rng.random(), 1)
            n_so_far = len(rows)
            # plant keys hovering at the threshold: after planting, total N
            # changes, so plant counts around (N_final / 80)
            for k in range(5):
                add(-100.0 - k + 0.5, rng.randint(8, 14))
            add(1000.25, max(1, len(rows) // 40))  # a clear heavy hitter
            if rng.random() < 0.5:
                add(float("nan"), 3)
                add(float("inf"), 2)
                rows.append((i, BASE, 1, "view", None)); i += 1
        else:
            for _ in range(rng.randint(20, 200)):
                add(rng.gauss(0, 30), 1)
            add(7.5, rng.randint(5, 30))
        d = _write_events(rows)
        got = [(r.bucket, r.cnt, r.n_total) for r in q(spark, d).collect()]

        keys = [
            math.floor(v)
            for _e, _ts, _u, _et, v in rows
            if v is not None and math.isfinite(v)
        ]
        n = len(keys)
        cnt: dict = {}
        for k in keys:
            cnt[k] = cnt.get(k, 0) + 1
        want = sorted(
            ((k, c, n) for k, c in cnt.items() if c * HH_K > n),
            key=lambda r: (-r[1], r[0]),
        )
        if got != want:
            fails += 1
            print(f"  hh trial {t}: MISMATCH\n    engine={got[:6]}\n    brute={want[:6]}")
    return fails


# ---------------------------------------------------------------------------
# diff: q_snapshot_diff vs a Python dict diff of the declared derivation
# ---------------------------------------------------------------------------


def fuzz_diff(spark, trials: int = 8) -> int:
    """q_snapshot_diff (fingerprint full-outer join over the two derived
    snapshots) vs a Python dict diff implementing the DECLARED derivation:
    old = docs minus doc_id%7==2 with text rewritten to 'OLD::'||text on
    doc_id%13==5, new = docs minus doc_id%11==3, status by md5(COALESCE
    (text,'')) equality. Axes: null text (hashes as ''), null text ON the
    %13 rewrite ids ('OLD::' vs '' -> changed), ids hitting several rules
    at once (LCM neighborhoods), ids in only one snapshot."""
    import hashlib

    q = get_query("q_snapshot_diff").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(23000 + t)
        hostile = t % 2 == 0
        ids = rng.sample(range(0, 4000), rng.randint(5, 150))
        if hostile:
            # force multi-rule collisions: %7==2, %11==3, %13==5 overlaps
            ids = sorted(set(ids) | {2, 3, 5, 16, 25, 44, 58, 93, 135, 1001, 2002})
        rows = []
        for i in ids:
            r = rng.random()
            text = None if (hostile and r < 0.15) else " ".join(
                f"s{rng.randint(0, 30)}" for _ in range(rng.randint(0, 10))
            )
            rows.append((i, text, "en", "s"))
        d = _write_documents(rows)
        got = sorted((r.doc_id, r.status) for r in q(spark, d).collect())

        def fp(x):
            return hashlib.md5((x or "").encode()).hexdigest()

        old = {
            i: fp(("OLD::" + (txt or "")) if i % 13 == 5 else txt)
            for i, txt, _l, _s in rows
            if i % 7 != 2
        }
        new = {i: fp(txt) for i, txt, _l, _s in rows if i % 11 != 3}
        want = []
        for i in set(old) | set(new):
            if i not in old:
                st = "added"
            elif i not in new:
                st = "removed"
            elif old[i] == new[i]:
                st = "unchanged"
            else:
                st = "changed"
            want.append((i, st))
        want.sort()
        if got != want:
            fails += 1
            diff = [(a, b) for a, b in zip(got, want) if a != b]
            print(f"  diff trial {t}: MISMATCH first={diff[:4]}")
    return fails


# ---------------------------------------------------------------------------
# chunk: q_llm_chunk vs a Python sliding-window recount
# ---------------------------------------------------------------------------


def fuzz_chunk(spark, trials: int = 8) -> int:
    """q_llm_chunk (computed chunk counts + sequence explode + array slice)
    vs a Python sliding-window recount of the declared rule: 20-token
    windows at stride 15, n_chunks = max(ceil((len-20)/15)+1, 1), last
    window ragged. Axes: lengths exactly AT 20/21/35/36 (the
    one-vs-two-chunk and exact-fit boundaries), single-token docs,
    empty/whitespace docs (excluded), non-strided ids (excluded)."""
    from hadoop_web_browsing_logs_spark.operators.llm_pipeline import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
    )

    q = get_query("q_llm_chunk").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(24000 + t)
        hostile = t % 2 == 0
        rows = []
        for i in range(rng.randint(3, 80)):
            doc_id = i * 10 if rng.random() < 0.8 else i * 10 + rng.randint(1, 9)
            if hostile and rng.random() < 0.15:
                nlen = rng.choice([CHUNK_TOKENS - 1, CHUNK_TOKENS, CHUNK_TOKENS + 1,
                                   CHUNK_TOKENS + CHUNK_STRIDE,
                                   CHUNK_TOKENS + CHUNK_STRIDE + 1, 1])
            elif hostile and rng.random() < 0.1:
                nlen = 0
            else:
                nlen = rng.randint(0, 90)
            text = " ".join(f"k{j}" for j in range(nlen)) if nlen else rng.choice(["", "  "])
            rows.append((doc_id, text, "en", "s"))
        d = _write_documents(rows)
        got = sorted(
            (r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens)
            for r in q(spark, d).collect()
        )

        import math

        want = []
        for doc_id, text, _l, _s in rows:
            if doc_id % 10 != 0:
                continue
            toks = _tokens(text)
            n = len(toks)
            if n == 0:
                continue
            n_chunks = max(math.ceil((n - CHUNK_TOKENS) / CHUNK_STRIDE) + 1, 1)
            for idx in range(n_chunks):
                w = toks[idx * CHUNK_STRIDE : idx * CHUNK_STRIDE + CHUNK_TOKENS]
                want.append((doc_id, idx, " ".join(w), min(CHUNK_TOKENS, n - idx * CHUNK_STRIDE)))
        want.sort()
        if got != want:
            fails += 1
            diff = [(a, b) for a, b in zip(got, want) if a != b]
            print(f"  chunk trial {t}: MISMATCH first={diff[:3]} lens {len(got)}/{len(want)}")
    return fails


# ---------------------------------------------------------------------------
# rollup: q_events_rollup_multires vs a Python three-grain recount
# ---------------------------------------------------------------------------


def fuzz_rollup(spark, trials: int = 8) -> int:
    """q_events_rollup_multires (one grouping-sets pass) vs a Python
    recount building the three grains independently (hour truncation, day
    truncation, epoch//604800 week index) with dsum integer cents. The
    grain column derives from which bucket is non-null — so a NULL-ts row
    labels 'week' in EVERY set and the hour/day sets' null-bucket rows
    COLLIDE with the week set's on visible columns (separate rows, same
    values: multiset compare). Axes: null ts, week boundaries (epoch
    604800 multiples), events exactly at midnight, negative values, null
    values (counted, not summed)."""
    q = get_query("q_events_rollup_multires").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(25000 + t)
        hostile = t % 2 == 0
        rows = []
        for i in range(rng.randint(3, 150)):
            if hostile:
                # land near week boundaries: BASE is 2024-01-01 (a Monday);
                # epoch-week boundaries fall Thursdays — exercise both
                days = rng.choice([0, 3, 4, 6, 7, 10, 11])
                ts = BASE + timedelta(days=days, hours=rng.choice([0, 23]), minutes=rng.choice([0, 59]))
            else:
                ts = BASE + timedelta(minutes=rng.randint(0, 60 * 24 * 20))
            if hostile and rng.random() < 0.07:
                ts = None
            val = round(rng.uniform(-30, 30), 2)
            if hostile and rng.random() < 0.08:
                val = None
            rows.append((i, ts, rng.randint(1, 5), rng.choice(["a", "b"]), val))
        d = _write_events(rows)
        from collections import Counter

        got = Counter(
            (r.event_type, r.grain, r.hour_bucket, r.day_bucket, r.week_idx,
             r.n_events, r.sum_value)
            for r in q(spark, d).collect()
        )

        def grain_row(et, hour, day, week, group):
            g = "hour" if hour is not None else ("day" if day is not None else "week")
            cnt = len(group)
            micros = [int(round(v * 100)) for _ts, v in group if v is not None]
            s = sum(micros) / 100 if micros else None
            return (et, g, hour, day, week, cnt, s)

        buckets: dict = {}
        for _i, ts, _u, et, v in rows:
            hour = ts.replace(minute=0, second=0, microsecond=0) if ts else None
            day = ts.replace(hour=0, minute=0, second=0, microsecond=0) if ts else None
            week = int((ts - datetime(1970, 1, 1)).total_seconds() // 604800) if ts else None
            buckets.setdefault(("hour", et, hour), []).append((ts, v))
            buckets.setdefault(("day", et, day), []).append((ts, v))
            buckets.setdefault(("week", et, week), []).append((ts, v))
        want: Counter = Counter()
        for (setname, et, key), group in buckets.items():
            hour = key if setname == "hour" else None
            day = key if setname == "day" else None
            week = key if setname == "week" else None
            want[grain_row(et, hour, day, week, group)] += 1
        if got != want:
            fails += 1
            only_e = list((got - want).items())[:3]
            only_b = list((want - got).items())[:3]
            print(f"  rollup trial {t}: MISMATCH\n    only-engine={only_e}\n    only-brute={only_b}")
    return fails


# ---------------------------------------------------------------------------
# canonical: q_dedup_keep_canonical vs union-find + longest-survivor recount
# ---------------------------------------------------------------------------


def fuzz_canonical(spark, trials: int = 8) -> int:
    """q_dedup_keep_canonical (Jaccard pairs -> connected_components ->
    longest-doc argmax per cluster) vs an independent union-find + Python
    argmax. Third consumer of the components kernel fuzzed on the CHAIN
    axis (diameter 30-60), plus: equal-LENGTH texts inside one cluster
    (the (length, -doc_id) struct tie-break must pick the smallest id),
    clusters where the longest member is NOT the smallest id, and
    tiny-vocab incidental clusters."""
    from hadoop_web_browsing_logs_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        PAIR_STRIDE,
    )

    q = get_query("q_dedup_keep_canonical").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(26000 + t)
        hostile = t % 2 == 0
        rows = []
        nid = 0

        def sid():
            nonlocal nid
            nid += PAIR_STRIDE
            return nid

        chain_len = rng.randint(30, 60) if hostile else rng.randint(2, 8)
        # pad token names so some chain members share the same CHAR length
        base = [f"c{j:03d}" for j in range(chain_len + 19)]
        for k in range(chain_len):
            rows.append((sid(), " ".join(base[k : k + 20]), "en", "s"))
        vocab = [f"v{j}" for j in range(3)]
        for _ in range(rng.randint(0, 30)):
            rows.append((sid(), " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 10))), "en", "s"))
        d = _write_documents(rows)
        got = {
            r.component: (r.keeper_doc, r.keeper_len, r.n_members, r.n_dropped, r.dropped)
            for r in q(spark, d).collect()
        }

        text_of = {i: txt for i, txt, _l, _s in rows}
        toks = {
            i: set(_tokens(txt))
            for i, txt, _l, _s in rows
            if i % PAIR_STRIDE == 0 and _tokens(txt)
        }
        parent = {i: i for i in toks}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ids = sorted(toks)
        edges = set()
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                inter = len(toks[a] & toks[b])
                if inter / (len(toks[a]) + len(toks[b]) - inter) >= JACCARD_THRESHOLD:
                    edges.add((a, b))
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        # only nodes that appear in at least one pair carry a component row
        in_pair = {x for e in edges for x in e}
        comp: dict = {}
        for i in in_pair:
            comp.setdefault(find(i), []).append(i)
        want = {}
        for root, members in comp.items():
            members.sort()
            gid = min(members)
            keeper = max(members, key=lambda m: (len(text_of[m]), -m))
            dropped = " ".join(str(m) for m in members if m != keeper)
            want[gid] = (keeper, len(text_of[keeper]), len(members), len(members) - 1, dropped)
        if got != want:
            fails += 1
            bad = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
            print(f"  canonical trial {t}: MISMATCH {[(k, got.get(k), want.get(k)) for k in sorted(bad)][:3]}")
    return fails


# ---------------------------------------------------------------------------
# substring: q_dedup_substring vs a Python rolling-window recount
# ---------------------------------------------------------------------------


def fuzz_substring(spark, trials: int = 8) -> int:
    """q_dedup_substring (rolling 10-token MD5 windows, cross-doc flags)
    vs a Python rolling-window recount. Axes: a window repeated INSIDE one
    doc (n_occ > n_docs; single-doc repeats must NOT flag), docs exactly
    10 tokens long (one window), 9-token docs (no window), a shared
    passage planted across 3+ docs at different offsets, tiny vocab."""
    import hashlib

    from hadoop_web_browsing_logs_spark.operators.dedup import SUBSTR_WINDOW

    q = get_query("q_dedup_substring").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(27000 + t)
        hostile = t % 2 == 0
        passage = [f"p{j}" for j in range(SUBSTR_WINDOW + rng.randint(0, 5))]
        rows = []
        for i in range(rng.randint(3, 60)):
            r = rng.random()
            if hostile and r < 0.2:
                # the planted cross-doc passage at a random offset
                pre = [f"u{i}x{j}" for j in range(rng.randint(0, 6))]
                post = [f"u{i}y{j}" for j in range(rng.randint(0, 6))]
                words = pre + passage + post
            elif hostile and r < 0.35:
                # intra-doc repeat: same window twice in ONE doc
                rep = [f"r{i}z{j}" for j in range(SUBSTR_WINDOW)]
                words = rep + [f"m{i}"] + rep
            elif hostile and r < 0.45:
                words = [f"e{i}w{j}" for j in range(rng.choice([SUBSTR_WINDOW - 1, SUBSTR_WINDOW]))]
            else:
                words = [rng.choice([f"g{j}" for j in range(8)]) for _ in range(rng.randint(0, 30))]
            rows.append((i, " ".join(words), "en", "s"))
        d = _write_documents(rows)
        got = sorted(
            (r.win_hash, r.n_occ, r.n_docs, r.keeper_doc) for r in q(spark, d).collect()
        )

        occ: dict = {}
        for i, txt, _l, _s in rows:
            tk = _tokens(txt)
            for j in range(len(tk) - SUBSTR_WINDOW + 1):
                h = hashlib.md5(" ".join(tk[j : j + SUBSTR_WINDOW]).encode()).hexdigest()
                n_occ, docs = occ.get(h, (0, set()))
                docs.add(i)
                occ[h] = (n_occ + 1, docs)
        want = sorted(
            (h, n, len(ds), min(ds)) for h, (n, ds) in occ.items() if len(ds) > 1
        )
        if got != want:
            fails += 1
            print(f"  substring trial {t}: MISMATCH lens {len(got)}/{len(want)}")
    return fails


# ---------------------------------------------------------------------------
# tfidf: q_text_tfidf vs a textbook recount
# ---------------------------------------------------------------------------


def fuzz_tfidf(spark, trials: int = 8) -> int:
    """q_text_tfidf (map-side tf, df CASCADE re-aggregating tf, broadcast
    N, per-doc top-5) vs a textbook Python recount: tf * ln(N/df) ranked
    UNROUNDED then emitted ROUND(.,6). Axes: df == N terms (idf exactly 0
    -> tfidf 0 rows still rank by term), punctuation-attached tokens,
    single-term docs, empty docs counting in N, tfidf ties at the top-5
    boundary (term tie-break)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    q = get_query("q_text_tfidf").fn
    PUNCT = set(".,!?-;:'\"()")
    fails = 0
    for t in range(trials):
        rng = random.Random(28000 + t)
        hostile = t % 2 == 0
        common = ["every", "doc", "has", "these"]  # df == N candidates
        filler = [f"f{j}" for j in range(6 if hostile else 40)]
        rows = []
        for i in range(rng.randint(3, 120)):
            words = list(common) if hostile else []
            for _ in range(rng.randint(0, 25)):
                w = rng.choice(filler)
                if hostile and rng.random() < 0.2:
                    w += rng.choice([".", ",", "!"])
                words.append(w)
            if hostile and rng.random() < 0.08:
                words = []
            rows.append((i, " ".join(words), "en", "s"))
        d = _write_documents(rows)
        got = sorted(
            (r.doc_id, r.term, r.tf, r.df, r.tfidf, r.rnk) for r in q(spark, d).collect()
        )

        def toks(text):
            out = []
            for w in text.lower().strip().split():
                w = "".join(c for c in w if c not in PUNCT)
                if w:
                    out.append(w)
            return out

        tk = {i: toks(txt) for i, txt, _l, _s in rows}
        N = len(rows)
        df: dict = {}
        for v in tk.values():
            for term in set(v):
                df[term] = df.get(term, 0) + 1
        want = []
        for i, v in tk.items():
            if i % 20 != 0 or not v:
                continue
            scored = []
            for term in set(v):
                tf = v.count(term)
                x = tf * math.log(N / df[term])
                scored.append((term, tf, df[term], x))
            scored.sort(key=lambda r: (-r[3], r[0]))
            for rnk, (term, tf, dfv, x) in enumerate(scored[:5], 1):
                r6 = float(Decimal(x * 1000000).quantize(Decimal(1), rounding=ROUND_HALF_UP)) / 1000000
                want.append((i, term, tf, dfv, r6, rnk))
        want.sort()
        if got != want:
            fails += 1
            diffs = [(a, b) for a, b in zip(got, want) if a != b]
            print(f"  tfidf trial {t}: MISMATCH first={diffs[:3]} lens {len(got)}/{len(want)}")
    return fails


# ---------------------------------------------------------------------------
# budget: q_llm_token_budget vs a Python per-source running fold
# ---------------------------------------------------------------------------


def fuzz_budget(spark, trials: int = 8) -> int:
    """q_llm_token_budget (per-source window cumsum, keep while <= 2000)
    vs a Python running fold. Axes: a doc landing the cumsum EXACTLY at
    2000 (kept), a first doc alone over budget (docs_in_budget=0,
    tokens_used NULL), zero-token docs AFTER the boundary (cum unchanged
    and still <= 2000 -> still counted), null-text docs (SUM skips NULL:
    the row inherits the running cum; an all-NULL prefix has cum NULL and
    is NOT counted), doc_id order vs insert order."""
    q = get_query("q_llm_token_budget").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(29000 + t)
        hostile = t % 2 == 0
        rows = []
        ids = rng.sample(range(1000), rng.randint(3, 100))
        for i in ids:
            src = rng.choice(["s1", "s2", "s3"])
            r = rng.random()
            if hostile and r < 0.1:
                text = None
            elif hostile and r < 0.25:
                text = ""  # zero tokens
            elif hostile and r < 0.35:
                text = " ".join(f"b{j}" for j in range(rng.choice([1990, 2000, 2001, 2500])))
            else:
                text = " ".join(f"t{j}" for j in range(rng.randint(1, 600)))
            rows.append((i, text, "en", src))
        rng.shuffle(rows)
        d = _write_documents(rows)
        got = {
            r.source: (r.docs_in_budget, r.tokens_used)
            for r in q(spark, d).collect()
        }

        bysrc: dict = {}
        for i, text, _l, src in sorted(rows):
            bysrc.setdefault(src, []).append((i, None if text is None else len(_tokens(text))))
        want = {}
        for src, docs in bysrc.items():
            total, seen, n_in, used = 0, False, 0, None
            for _i, ntok in docs:
                if ntok is not None:
                    total += ntok
                    seen = True
                cum = total if seen else None
                if cum is not None and cum <= 2000:
                    n_in += 1
                    used = cum if used is None else max(used, cum)
            want[src] = (n_in, used)
        if got != want:
            fails += 1
            bad = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
            print(f"  budget trial {t}: MISMATCH {[(k, got.get(k), want.get(k)) for k in sorted(bad)][:3]}")
    return fails


# ---------------------------------------------------------------------------
# tempmix: q_llm_temperature_mix vs a Python n^0.5 weight recount
# ---------------------------------------------------------------------------


def fuzz_tempmix(spark, trials: int = 8) -> int:
    """q_llm_temperature_mix (n_tokens^0.5 weights, micro-quantized
    denominator, double + ppm emission) vs a Python recount with the same
    IEEE pow/divide order and Decimal ROUND_HALF_UP. Axes: a single
    source (weight exactly 1.0), zero-token sources (w_raw = 0), equal
    token totals (equal weights summing through the micro grid),
    an all-null-text source (n_tokens NULL -> NULL weight row)."""
    from decimal import ROUND_HALF_UP, Decimal

    q = get_query("q_llm_temperature_mix").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(30000 + t)
        hostile = t % 2 == 0
        n_sources = 1 if (hostile and rng.random() < 0.2) else rng.randint(2, 6)
        rows = []
        i = 0
        for s in range(n_sources):
            src = f"s{s}"
            kind = rng.random()
            for _ in range(rng.randint(1, 12)):
                if hostile and kind < 0.15:
                    text = None  # all-null source -> NULL n_tokens
                elif hostile and kind < 0.3:
                    text = ""  # zero tokens
                elif hostile and kind < 0.55:
                    text = " ".join(f"e{j}" for j in range(10))  # equal totals
                else:
                    text = " ".join(f"w{j}" for j in range(rng.randint(1, 80)))
                rows.append((i, text, "en", src))
                i += 1
        d = _write_documents(rows)
        got = {
            r.source: (r.n_tokens, r.weight, r.ppm) for r in q(spark, d).collect()
        }

        def rhu(x):
            return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

        tok_tot: dict = {}
        for _i, text, _l, src in rows:
            if src not in tok_tot:
                tok_tot[src] = None
            if text is not None:
                tok_tot[src] = (tok_tot[src] or 0) + len(_tokens(text))
        w_raw = {s: (None if n is None else n ** 0.5) for s, n in tok_tot.items()}
        denom = sum(rhu(w * 1000000) for w in w_raw.values() if w is not None) / 1000000
        want = {}
        for s, n in tok_tot.items():
            w = w_raw[s]
            if w is None:
                want[s] = (None, None, None)
            else:
                weight = w / denom
                want[s] = (n, weight, rhu(weight * 1000000))
        if got != want:
            fails += 1
            bad = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
            print(f"  tempmix trial {t}: MISMATCH {[(k, got.get(k), want.get(k)) for k in sorted(bad)][:3]}")
    return fails


# ---------------------------------------------------------------------------
# int8: q_vec_quantize_int8 vs a numpy/Python recount
# ---------------------------------------------------------------------------


def _write_embeddings(rows) -> str:
    """rows: (vec_id, list[float]|None, label)."""
    d = tempfile.mkdtemp(prefix="fuzz13_emb_")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE em (vec_id BIGINT, embedding FLOAT[], label INTEGER)"
    )
    con.executemany("INSERT INTO em VALUES (?,?,?)", rows)
    con.execute(f"COPY em TO '{d}/embeddings.parquet' (FORMAT PARQUET)")
    return d


def fuzz_int8(spark, trials: int = 8) -> int:
    """q_vec_quantize_int8 (max-abs scale, FLOOR(x*127/scale + 0.5)
    half-up integer codes, checksum + reconstruction-error emission) vs a
    Python recount over the float32-faithful values. Axes: vectors of
    arbitrary dimension (this query does NOT impose the declared-dim
    contract), all-zero vectors (the 1e-30 scale floor), exact-half codes
    (values landing x*127/scale + 0.5 on an integer), negative-dominated
    vectors, NaN/Inf/NULL-element and empty/NULL vectors (excluded)."""
    import math
    import struct

    q = get_query("q_vec_quantize_int8").fn

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    fails = 0
    for t in range(trials):
        rng = random.Random(31000 + t)
        hostile = t % 2 == 0
        rows = []
        for i in range(rng.randint(3, 80)):
            r = rng.random()
            dim = rng.choice([1, 2, 5, 16]) if hostile else 16
            if hostile and r < 0.08:
                rows.append((i, None, 0))
                continue
            if hostile and r < 0.14:
                rows.append((i, [], 0))
                continue
            if hostile and r < 0.2:
                v = [rng.uniform(-1, 1) for _ in range(dim)]
                v[rng.randrange(dim)] = rng.choice([float("nan"), float("inf"), None])
                rows.append((i, v, 0))
                continue
            if hostile and r < 0.3:
                rows.append((i, [0.0] * dim, 0))  # scale floor
                continue
            if hostile and r < 0.45:
                # exact-half codes: elements at k/127 of the max-abs element
                m = rng.uniform(0.5, 2.0)
                v = [m] + [m * (k + 0.5) / 127.0 for k in rng.sample(range(127), min(dim - 1, 8))]
                v = v[:dim] + [0.0] * max(0, dim - len(v))
                rows.append((i, v, 0))
                continue
            rows.append((i, [rng.uniform(-3, 3) for _ in range(dim)], 0))
        d = _write_embeddings(rows)
        got = {
            r.vec_id: (r.scale, r.q_sum, r.q_abs_sum, r.q_sq_sum, r.max_abs_err)
            for r in q(spark, d).collect()
        }

        want = {}
        for i, v, _lab in rows:
            if v is None or len(v) == 0:
                continue
            xd = [None if x is None else f32(x) for x in v]
            if any(x is None or not math.isfinite(x) for x in xd):
                continue
            scale = max(max(abs(x) for x in xd), 1e-30)
            qv = [math.floor(x * 127.0 / scale + 0.5) for x in xd]
            err = max(abs(x - qc * scale / 127.0) for x, qc in zip(xd, qv))
            want[i] = (scale, sum(qv), sum(abs(c) for c in qv), sum(c * c for c in qv), err)
        if got != want:
            fails += 1
            bad = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
            print(f"  int8 trial {t}: MISMATCH {[(k, got.get(k), want.get(k)) for k in sorted(bad)][:3]}")
    return fails


# ---------------------------------------------------------------------------
# langid: q_text_langid vs a Python marker-vote recount
# ---------------------------------------------------------------------------


def fuzz_langid(spark, trials: int = 8) -> int:
    """q_text_langid (per-language marker-token counts, GREATEST argmax,
    first-match tie-break in declaration order, all-zero -> 'und') vs a
    Python vote recount. Axes: CROSS-LANGUAGE ambiguous markers ('la' is
    fr AND es; 'en'/'es'/'que' collide too) forcing exact ties that the
    declaration-order tie-break must resolve, repeated markers (counts,
    not distinct presence), empty docs ('und'), marker-free docs,
    punctuation-attached markers (ws_tokens does NOT strip punctuation —
    'the.' votes for nothing)."""
    from hadoop_web_browsing_logs_spark.functions.text_stats import LANG_MARKERS

    q = get_query("q_text_langid").fn
    all_markers = sorted({m for ms in LANG_MARKERS.values() for m in ms})
    ambiguous = sorted(
        m for m in all_markers
        if sum(1 for ms in LANG_MARKERS.values() if m in ms) > 1
    )
    fails = 0
    for t in range(trials):
        rng = random.Random(32000 + t)
        hostile = t % 2 == 0
        rows = []
        for i in range(rng.randint(3, 100)):
            r = rng.random()
            if hostile and r < 0.25 and ambiguous:
                words = [rng.choice(ambiguous) for _ in range(rng.randint(1, 6))]
            elif hostile and r < 0.35:
                words = []
            elif hostile and r < 0.45:
                words = [rng.choice(all_markers) + "." for _ in range(rng.randint(1, 4))]
            elif hostile and r < 0.6:
                # exact tie between two specific languages
                words = ["the", "der"] * rng.randint(1, 3)
            else:
                words = [
                    rng.choice(all_markers if rng.random() < 0.5 else ["zz", "qq", "xx"])
                    for _ in range(rng.randint(0, 20))
                ]
            rows.append((i, " ".join(words), rng.choice(["en", "de", "fr", "es"]), "s"))
        d = _write_documents(rows)
        cols = [f"score_{lang}" for lang in LANG_MARKERS]
        got = {
            r.doc_id: (r.labeled_lang, tuple(r[c] for c in cols), r.lang_guess)
            for r in q(spark, d).collect()
        }

        want = {}
        for i, text, lab, _s in rows:
            toks = _tokens(text)
            scores = {
                lang: sum(1 for w in toks if w in ms)
                for lang, ms in LANG_MARKERS.items()
            }
            best = max(scores.values()) if scores else 0
            if best == 0:
                guess = "und"
            else:
                guess = next(l for l in LANG_MARKERS if scores[l] == best)
            want[i] = (lab, tuple(scores[l] for l in LANG_MARKERS), guess)
        if got != want:
            fails += 1
            bad = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
            print(f"  langid trial {t}: MISMATCH {[(k, got.get(k), want.get(k)) for k in sorted(bad)][:3]}")
    return fails


# ---------------------------------------------------------------------------
# funnel: q_llm_corpus_funnel vs a Python stage recount
# ---------------------------------------------------------------------------


def fuzz_funnel(spark, trials: int = 8) -> int:
    """q_llm_corpus_funnel (raw -> 10..5000-token quality -> md5-dedup
    unique -> MIN-token final budget, per source, null-safe joins) vs a
    Python stage recount. Axes: NULL source (must reconcile through the
    null-safe joins, not drop), NULL text (counts raw, fails quality),
    duplicate texts with DIFFERENT sources (dedup is per source),
    duplicate texts with different lengths impossible (same fp -> same
    text -> same n_tok; instead duplicate exact texts repeated), docs at
    exactly 10 / 5000 / 9 / 5001 tokens (BETWEEN bounds)."""
    import hashlib

    q = get_query("q_llm_corpus_funnel").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(33000 + t)
        hostile = t % 2 == 0
        rows = []
        dup_pool = []
        for i in range(rng.randint(3, 120)):
            src = rng.choice(["s1", "s2", None] if hostile else ["s1", "s2", "s3"])
            r = rng.random()
            if hostile and r < 0.08:
                text = None
            elif hostile and r < 0.2:
                n = rng.choice([9, 10, 11, 4999, 5000])
                text = " ".join(f"w{j}" for j in range(n))
            elif hostile and r < 0.4 and dup_pool:
                text = rng.choice(dup_pool)
            else:
                text = " ".join(f"x{rng.randint(0, 40)}" for _ in range(rng.randint(0, 60)))
                dup_pool.append(text)
            rows.append((i, text, "en", src))
        d = _write_documents(rows)
        got = {
            r.source: (r.n_raw, r.n_quality, r.n_unique, r.tokens_final)
            for r in q(spark, d).collect()
        }

        stages: dict = {}
        for _i, text, _l, src in rows:
            raw, qual = stages.get(src, (0, {}))
            raw += 1
            ntok = None if text is None else len(_tokens(text))
            if ntok is not None and 10 <= ntok <= 5000:
                fp = hashlib.md5((text or "").lower().strip().encode()).hexdigest()
                qual.setdefault(fp, []).append(ntok)
            stages[src] = (raw, qual)
        want = {}
        for src, (raw, qual) in stages.items():
            n_quality = sum(len(v) for v in qual.values())
            n_unique = len(qual)
            tokens_final = sum(min(v) for v in qual.values()) if qual else 0
            want[src] = (raw, n_quality, n_unique, tokens_final)
        if got != want:
            fails += 1
            bad = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
            print(f"  funnel trial {t}: MISMATCH {[(k, got.get(k), want.get(k)) for k in sorted(bad)][:3]}")
    return fails


# ---------------------------------------------------------------------------
# fuzzy: fuzzy_vocab_pairs vs a textbook Levenshtein DP cross-join
# ---------------------------------------------------------------------------


def fuzz_fuzzy(spark, trials: int = 6) -> int:
    """fuzzy_vocab_pairs (SymSpell deletion-variant blocking + Spark
    levenshtein verify) vs a textbook Python DP over the naive cross-join.
    The registered oracle is already an independent DuckDB formulation;
    this adds ADVERSARIAL vocabularies the fixture lacks: transposition
    pairs ('abcd'/'bacd' = ed 2 via delete+insert), pairs at exactly ed 2
    vs 3, shared-variant-but-far pairs (blocking may generate the
    candidate; the verify must reject), words at the 3/24 length bounds,
    and dense 1-char-apart ladders."""
    from hadoop_web_browsing_logs_spark.operators.dedup import fuzzy_vocab_pairs

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    fails = 0
    for t in range(trials):
        rng = random.Random(34000 + t)
        hostile = t % 2 == 0
        vocab = set()
        alpha = "abcd" if hostile else "abcdefgh"
        for _ in range(rng.randint(5, 40)):
            vocab.add("".join(rng.choice(alpha) for _ in range(rng.randint(3, 8))))
        if hostile:
            base = "".join(rng.choice(alpha) for _ in range(6))
            vocab.add(base)
            vocab.add(base[1] + base[0] + base[2:])  # transposition: ed <= 2
            vocab.add(base + "xy")                    # ed 2 suffix
            vocab.add(base + "xyz")                   # ed 3: must NOT pair with base
            vocab.add("abc")                          # min length bound
            vocab.add("a" * 24)                       # max length bound
            vocab.add("a" * 23)
        vocab = sorted(vocab)
        vdf = spark.createDataFrame([(w,) for w in vocab], ["term"])
        got = sorted(
            (r.term_a, r.term_b, r.dist) for r in fuzzy_vocab_pairs(vdf).collect()
        )
        want = sorted(
            (a, b, lev(a, b))
            for ai, a in enumerate(vocab)
            for b in vocab[ai + 1 :]
            if lev(a, b) <= 2
        )
        if got != want:
            fails += 1
            ge, gb = set(got), set(want)
            print(f"  fuzzy trial {t}: MISMATCH only-engine={sorted(ge-gb)[:4]} only-brute={sorted(gb-ge)[:4]}")
    return fails


# ---------------------------------------------------------------------------
# latency: q_events_conversion_latency vs a Python first-touch recount
# ---------------------------------------------------------------------------


def _pct_linear(sorted_vals, q):
    """Exact linear-interpolation percentile mirroring SPARK's
    percentile() semantics, established by live probes from this sweep:

    - unequal neighbors: the two-product IEEE form lower*(1-f) + upper*f
      (NOT the algebraically-equal a + (b-a)*f, which differs at the last
      ulp — 40047.399999999994 vs 40047.4 on a 3-element p90);
    - EQUAL neighbors: the value itself, exactly. Spark aggregates counts
      per DISTINCT value, so a position inside a duplicate run never
      interpolates — where DuckDB's quantile_cont lerps two equal array
      slots with the two-product form and lands 1 ulp off for doubles
      like 14.81 (14.809999999999999). The engines genuinely diverge at
      that ulp; the oracle gate's 6-decimal float canonicalization
      absorbs it (SCALE.md round-13 ledger)."""
    n = len(sorted_vals)
    if n == 0:
        return None
    pos = q * (n - 1)
    lo = int(pos)
    frac = pos - lo
    if lo + 1 >= n:
        return float(sorted_vals[-1])
    a, b = float(sorted_vals[lo]), float(sorted_vals[lo + 1])
    if a == b:
        return a
    return a * (1 - frac) + b * frac


def fuzz_latency(spark, trials: int = 8) -> int:
    """q_events_conversion_latency (first view -> first subsequent
    purchase, exact median/p90) vs a Python first-touch recount. Axes:
    purchase exactly AT the first view's ts (>= includes it, delta 0),
    purchases strictly BEFORE the first view only (not converted),
    purchasers with no view at all (excluded), zero converting users
    (n=0, NULL percentiles), single converter (median == p90), null
    user/ts rows."""
    q = get_query("q_events_conversion_latency").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(35000 + t)
        hostile = t % 2 == 0
        rows = []
        for i in range(rng.randint(2, 140)):
            uid = rng.randint(1, 12)
            et = rng.choice(["view", "purchase", "click"])
            ts = BASE + timedelta(minutes=rng.randint(0, 2000), seconds=rng.randint(0, 59))
            if hostile and rng.random() < 0.05:
                ts = None
            if hostile and rng.random() < 0.05:
                uid = None
            rows.append((i, ts, uid, et, 1.0))
        if hostile:
            # planted: purchase exactly at first view; purchase-only user;
            # purchase strictly before the user's only view
            n0 = len(rows)
            rows.append((n0, BASE, 100, "view", 1.0))
            rows.append((n0 + 1, BASE, 100, "purchase", 1.0))
            rows.append((n0 + 2, BASE, 101, "purchase", 1.0))
            rows.append((n0 + 3, BASE + timedelta(hours=2), 102, "purchase", 1.0))
            rows.append((n0 + 4, BASE + timedelta(hours=3), 102, "view", 1.0))
        d = _write_events(rows)
        got = [(r.n_converted, r.median_secs, r.p90_secs) for r in q(spark, d).collect()]

        ev = [(u, et, ts) for _i, ts, u, et, _v in rows if u is not None and ts is not None]
        vts = {}
        for u, et, ts in ev:
            if et == "view" and (u not in vts or ts < vts[u]):
                vts[u] = ts
        deltas = []
        for u, first_view in vts.items():
            purchases = [ts for (uu, et, ts) in ev if uu == u and et == "purchase" and ts >= first_view]
            if purchases:
                deltas.append(
                    int((min(purchases) - datetime(1970, 1, 1)).total_seconds() // 1)
                    - int((first_view - datetime(1970, 1, 1)).total_seconds() // 1)
                )
        deltas.sort()
        want = [(len(deltas), _pct_linear(deltas, 0.5), _pct_linear(deltas, 0.9))]
        if got != want:
            fails += 1
            print(f"  latency trial {t}: MISMATCH engine={got} brute={want}")
    return fails


# ---------------------------------------------------------------------------
# zscore: q_events_anomaly_zscore vs a Python moment recount
# ---------------------------------------------------------------------------


def fuzz_zscore(spark, trials: int = 8) -> int:
    """q_events_anomaly_zscore (hourly dsum -> exact integer-cent moments
    -> z + flag) vs a Python recount in the same IEEE op order. Axes:
    single-hour types (n=1 -> NULL z), constant types (variance exactly 0
    -> NULL), NaN/Inf values (TRY_CAST -> NULL, skipped), NULL-ts rows
    (date_trunc(NULL) is its own hourly group and participates in the
    stats), values crossing zero."""
    import math

    q = get_query("q_events_anomaly_zscore").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(36000 + t)
        hostile = t % 2 == 0
        rows = []
        for i in range(rng.randint(2, 150)):
            et = rng.choice(["a", "b", "c"])
            h = rng.randint(0, 2 if hostile else 15)
            ts = BASE + timedelta(hours=h, minutes=rng.randint(0, 59))
            val = 7.0 if (hostile and et == "c") else round(rng.uniform(-40, 40), 2)
            if hostile and rng.random() < 0.05:
                ts = None
            if hostile and rng.random() < 0.04:
                val = rng.choice([float("nan"), float("inf")])
            rows.append((i, ts, rng.randint(1, 5), et, val))
        d = _write_events(rows)
        got = {
            (r.event_type, r.hour): (r.sum_value, r.zscore, r.is_anomaly)
            for r in q(spark, d).collect()
        }

        hourly: dict = {}
        for _i, ts, _u, et, v in rows:
            h = ts.replace(minute=0, second=0, microsecond=0) if ts else None
            cents = hourly.get((et, h), 0)
            if v is not None and math.isfinite(v):
                cents += int(round(v * 100))
            hourly[(et, h)] = cents
        want = {}
        stats: dict = {}
        for (et, h), cents in hourly.items():
            n, s1c, s2c = stats.get(et, (0, 0, 0))
            stats[et] = (n + 1, s1c + cents, s2c + cents * cents)
        for (et, h), cents in hourly.items():
            n, s1c, s2c = stats[et]
            s1 = s1c / 100
            s2 = s2c / 10000
            x = cents / 100
            z = flag = None
            if n > 1:
                var = (s2 - s1 * s1 / n) / (n - 1)
                if var > 0:
                    z = (x - s1 / n) / math.sqrt(var)
                    flag = 1 if abs(z) > 2.0 else 0
            want[(et, h)] = (x, z, flag)
        if got != want:
            fails += 1
            bad = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
            print(f"  zscore trial {t}: MISMATCH {[(k, got.get(k), want.get(k)) for k in sorted(bad, key=str)][:3]}")
    return fails


# ---------------------------------------------------------------------------
# robust: q_events_robust_zscore vs a Python median/MAD recount
# ---------------------------------------------------------------------------


def fuzz_robust(spark, trials: int = 8) -> int:
    """q_events_robust_zscore (exact median -> MAD -> Iglewicz-Hoberg 3.5
    flag count, zero-MAD types excluded) vs a Python recount using the
    same linear-interpolation percentile formula. Axes: even/odd counts
    (interpolated vs exact-element medians), >=50%-constant types (MAD
    exactly 0 -> excluded), all-constant, single-row types, NaN/Inf/null
    excluded, negative-heavy distributions."""
    import math

    q = get_query("q_events_robust_zscore").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(37000 + t)
        hostile = t % 2 == 0
        rows = []
        i = 0
        for et, kind in (("a", "normal"), ("b", "halfconst"), ("c", "const"), ("d", "single")):
            n = {"normal": rng.randint(2, 80), "halfconst": rng.randint(6, 30),
                 "const": rng.randint(2, 10), "single": 1}[kind]
            if not hostile and kind != "normal":
                continue
            for k in range(n):
                if kind == "const" or (kind == "halfconst" and k % 2 == 0):
                    v = 5.0
                else:
                    v = round(rng.uniform(-60, 60), 2)
                if hostile and rng.random() < 0.04:
                    v = rng.choice([None, float("nan"), float("-inf")])
                rows.append((i, BASE + timedelta(minutes=i), rng.randint(1, 5), et, v))
                i += 1
        d = _write_events(rows)
        got = {
            r.event_type: (r.med, r.mad, r.n, r.n_outliers)
            for r in q(spark, d).collect()
        }

        byt: dict = {}
        for _i, _ts, _u, et, v in rows:
            if et is not None and v is not None and math.isfinite(v):
                byt.setdefault(et, []).append(v)
        want = {}
        for et, vals in byt.items():
            med = _pct_linear(sorted(vals), 0.5)
            mad = _pct_linear(sorted(abs(v - med) for v in vals), 0.5)
            if mad is None or mad <= 0:
                continue
            n_out = sum(1 for v in vals if abs(0.6745 * (v - med) / mad) > 3.5)
            want[et] = (med, mad, len(vals), n_out)
        if got != want:
            fails += 1
            bad = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
            print(f"  robust trial {t}: MISMATCH {[(k, got.get(k), want.get(k)) for k in sorted(bad)][:3]}")
    return fails


# ---------------------------------------------------------------------------
# quality: q_llm_quality_rules vs a Python rule recount
# ---------------------------------------------------------------------------


def fuzz_quality(spark, trials: int = 8) -> int:
    """q_llm_quality_rules (Gopher-style length / mean-word-length /
    repetition rules, per-language pass counts) vs a Python recount.
    Axes: docs at exactly 10 / 5000 / 9 tokens, mean word length exactly
    2.0 and 12.0 (inclusive BETWEEN bounds on a double ratio),
    repetition ratio exactly 0.2 (<=), empty and null-text docs (count
    in n_docs, NULL ratios fail every rule), null lang group."""
    q = get_query("q_llm_quality_rules").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(38000 + t)
        hostile = t % 2 == 0
        rows = []
        for i in range(rng.randint(3, 120)):
            lang = rng.choice(["en", "de", None] if hostile else ["en", "de", "fr"])
            r = rng.random()
            if hostile and r < 0.08:
                text = None
            elif hostile and r < 0.16:
                text = ""
            elif hostile and r < 0.28:
                n = rng.choice([9, 10, 11, 5000])
                text = " ".join(f"w{j}" for j in range(n))  # mean_wlen 2-5ish
            elif hostile and r < 0.4:
                # mean word length exactly 2.0 ('aa' x k) or 12.0
                w = "aa" if rng.random() < 0.5 else "a" * 12
                text = " ".join([w] * rng.randint(10, 40))
            elif hostile and r < 0.5:
                # repetition ratio exactly 0.2: 'dup' twice among 10 tokens
                text = "dup dup " + " ".join(f"u{j}" for j in range(8))
            else:
                text = " ".join(f"x{rng.randint(0, 50)}" for _ in range(rng.randint(0, 80)))
            rows.append((i, text, lang, "s"))
        d = _write_documents(rows)
        got = {
            r.lang: (r.n_docs, r.pass_length, r.pass_word_len, r.pass_repetition, r.pass_all)
            for r in q(spark, d).collect()
        }

        agg: dict = {}
        for _i, text, lang, _s in rows:
            nd, pl, pw, pr, pa = agg.get(lang, (0, 0, 0, 0, 0))
            nd += 1
            toks = _tokens(text) if text is not None else None
            if toks:
                n_tok = len(toks)
                mean_wlen = sum(len(w) for w in toks) / n_tok
                counts: dict = {}
                for w in toks:
                    counts[w] = counts.get(w, 0) + 1
                rep = max(counts.values()) / n_tok
                a = 10 <= n_tok <= 5000
                b = 2 <= mean_wlen <= 12
                c = rep <= 0.2
                pl += a
                pw += b
                pr += c
                pa += a and b and c
            agg[lang] = (nd, pl, pw, pr, pa)
        if got != agg:
            fails += 1
            bad = {k for k in set(got) | set(agg) if got.get(k) != agg.get(k)}
            print(f"  quality trial {t}: MISMATCH {[(k, got.get(k), agg.get(k)) for k in sorted(bad, key=str)][:3]}")
    return fails


# ---------------------------------------------------------------------------
# winsorize: q_events_winsorize vs a Python clamp recount
# ---------------------------------------------------------------------------


def fuzz_winsorize(spark, trials: int = 8) -> int:
    """q_events_winsorize (exact [p05,p99] bounds, clamp counts, dsum(4)
    winsorized sum) vs a Python recount using the engines' two-product
    percentile lerp. Axes: single-value types (lo == hi == v, zero
    clamps), constant types, values exactly AT the bounds (strict < / >
    comparisons), negative-heavy, NaN/Inf/null excluded."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    q = get_query("q_events_winsorize").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(39000 + t)
        hostile = t % 2 == 0
        rows = []
        i = 0
        kinds = [("a", "normal"), ("b", "single"), ("c", "const"), ("d", "two")]
        for et, kind in kinds:
            if not hostile and kind != "normal":
                continue
            n = {"normal": rng.randint(3, 120), "single": 1, "const": rng.randint(2, 9), "two": 2}[kind]
            cval = round(rng.uniform(-20, 20), 2)
            for _ in range(n):
                if kind in ("const",):
                    v = cval
                else:
                    v = round(rng.uniform(-80, 80), 2)
                if hostile and rng.random() < 0.04:
                    v = rng.choice([None, float("nan"), float("inf")])
                rows.append((i, BASE + timedelta(minutes=i), rng.randint(1, 5), et, v))
                i += 1
        d = _write_events(rows)
        got = {
            r.event_type: (r.lo, r.hi, r.n, r.n_clamped_lo, r.n_clamped_hi, r.winsorized_sum)
            for r in q(spark, d).collect()
        }

        def rhu(x):
            return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

        byt: dict = {}
        for _i, _ts, _u, et, v in rows:
            if et is not None and v is not None and math.isfinite(v):
                byt.setdefault(et, []).append(v)
        want = {}
        for et, vals in byt.items():
            s = sorted(vals)
            lo, hi = _pct_linear(s, 0.05), _pct_linear(s, 0.99)
            nlo = sum(1 for v in vals if v < lo)
            nhi = sum(1 for v in vals if v > hi)
            wsum = sum(rhu(min(max(v, lo), hi) * 10000) for v in vals) / 10000
            want[et] = (lo, hi, len(vals), nlo, nhi, wsum)
        if got != want:
            fails += 1
            bad = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
            print(f"  winsorize trial {t}: MISMATCH {[(k, got.get(k), want.get(k)) for k in sorted(bad)][:3]}")
    return fails


# ---------------------------------------------------------------------------
# novelty: q_text_novelty vs a Python trigram-df recount
# ---------------------------------------------------------------------------


def fuzz_novelty(spark, trials: int = 8) -> int:
    """q_text_novelty (distinct trigram shingles, corpus df, unique
    fraction, micro-nat mean log df) vs a Python recount. Axes: docs of
    exactly 3 tokens (one shingle), sub-3-token docs (excluded),
    duplicate shingles INSIDE one doc (distinct-ed before df), all-unique
    corpora (mean_log_df exactly 0), heavy boilerplate (one shingle in
    every doc), tab/newline whitespace."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    q = get_query("q_text_novelty").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(40000 + t)
        hostile = t % 2 == 0
        boiler = "b0 b1 b2"
        rows = []
        for i in range(rng.randint(3, 100)):
            r = rng.random()
            if hostile and r < 0.1:
                text = " ".join(f"t{i}x{j}" for j in range(3))  # exactly 3
            elif hostile and r < 0.2:
                text = rng.choice(["", "one", "one two", "  \t "])  # excluded
            elif hostile and r < 0.35:
                text = f"{boiler} t{i}a t{i}b"  # shared boilerplate shingle
            elif hostile and r < 0.45:
                rep = f"r{i}a r{i}b r{i}c"
                text = f"{rep} {rep}"  # intra-doc duplicate shingles
            else:
                text = " ".join(f"w{rng.randint(0, 60)}" for _ in range(rng.randint(0, 25)))
            rows.append((i, text, "en", "s"))
        d = _write_documents(rows)
        got = {
            r.doc_id: (r.n_shingles, r.n_unique, r.unique_pct, r.mean_log_df)
            for r in q(spark, d).collect()
        }

        def rhu(x):
            return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

        sets = {}
        for i, text, _l, _s in rows:
            tk = _tokens(text)
            if len(tk) >= 3:
                sets[i] = {" ".join(tk[j : j + 3]) for j in range(len(tk) - 2)}
        df: dict = {}
        for ss in sets.values():
            for sh in ss:
                df[sh] = df.get(sh, 0) + 1
        want = {}
        for i, ss in sets.items():
            n = len(ss)
            uniq = sum(1 for sh in ss if df[sh] == 1)
            micro = sum(rhu(math.log(df[sh]) * 1000000) for sh in ss)
            want[i] = (n, uniq, uniq / n, (micro / 1000000) / n)
        if got != want:
            fails += 1
            bad = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
            print(f"  novelty trial {t}: MISMATCH {[(k, got.get(k), want.get(k)) for k in sorted(bad)][:3]}")
    return fails


# ---------------------------------------------------------------------------
# affinity: q_events_type_affinity vs a Python set-overlap recount
# ---------------------------------------------------------------------------


def fuzz_affinity(spark, trials: int = 8) -> int:
    """q_events_type_affinity (distinct (user,type) -> pair join ->
    Jaccard) vs a Python set recount. Axes: disjoint user bases (no row
    at all — the inner join never emits zero-intersection pairs),
    identical bases (jaccard exactly 1.0), single-user types, null
    user/type rows excluded, heavy repeat events (distinct-ed)."""
    q = get_query("q_events_type_affinity").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(41000 + t)
        hostile = t % 2 == 0
        types = ["a", "b", "c", "d"]
        rows = []
        for i in range(rng.randint(4, 160)):
            et = rng.choice(types)
            if hostile and et == "d":
                uid = rng.randint(100, 103)  # d's base disjoint from a/b/c
            elif hostile and et in ("a", "b"):
                uid = rng.randint(1, 3)  # a and b share a tiny base
            else:
                uid = rng.randint(1, 10)
            if hostile and rng.random() < 0.05:
                uid = None
            if hostile and rng.random() < 0.05:
                et = None
            rows.append((i, BASE + timedelta(minutes=i), uid, et, 1.0))
        d = _write_events(rows)
        got = {
            (r.type_a, r.type_b): (r.n_a, r.n_b, r.n_both, r.jaccard)
            for r in q(spark, d).collect()
        }

        bases: dict = {}
        for _i, _ts, uid, et, _v in rows:
            if uid is not None and et is not None:
                bases.setdefault(et, set()).add(uid)
        want = {}
        ts_ = sorted(bases)
        for ai in range(len(ts_)):
            for bi in range(ai + 1, len(ts_)):
                a, b = ts_[ai], ts_[bi]
                both = len(bases[a] & bases[b])
                if both:
                    want[(a, b)] = (
                        len(bases[a]), len(bases[b]), both,
                        both / (len(bases[a]) + len(bases[b]) - both),
                    )
        if got != want:
            fails += 1
            bad = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
            print(f"  affinity trial {t}: MISMATCH {[(k, got.get(k), want.get(k)) for k in sorted(bad)][:3]}")
    return fails


# ---------------------------------------------------------------------------
# welch: q_events_ab_welch vs a Python moment recount with try_divide rules
# ---------------------------------------------------------------------------


def fuzz_welch(spark, trials: int = 8) -> int:
    """q_events_ab_welch (per-type parity-cohort Welch t + Satterthwaite
    df from exact dsum moments) vs a Python recount in the same IEEE op
    order with the try_divide NULL rules. Axes: one-sided types (a cohort
    empty -> NULL mean/t/df), single-sample cohorts (n=1 -> NULL
    variance), zero-variance cohorts on BOTH sides (t and df divide by
    zero -> NULL), GREATEST clamping float-cancellation negatives,
    negative values."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    q = get_query("q_events_ab_welch").fn

    def rhu(x):
        return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    def tdiv(a, b):
        if a is None or b is None or b == 0:
            return None
        return a / b

    fails = 0
    for t in range(trials):
        rng = random.Random(42000 + t)
        hostile = t % 2 == 0
        rows = []
        i = 0
        plans = [("a", "normal"), ("b", "oneside"), ("c", "constboth"), ("d", "single")]
        for et, kind in plans:
            if not hostile and kind != "normal":
                continue
            n = {"normal": rng.randint(4, 120), "oneside": rng.randint(3, 20),
                 "constboth": rng.randint(4, 16), "single": 2}[kind]
            for k in range(n):
                if kind == "oneside":
                    uid = 2 * rng.randint(1, 9)  # only even users: cohort B empty
                elif kind == "single":
                    uid = k  # one even + one odd user -> n=1 cohorts
                else:
                    uid = rng.randint(1, 20)
                v = 3.14 if kind == "constboth" else round(rng.uniform(-50, 50), 2)
                rows.append((i, BASE + timedelta(minutes=i), uid, et, v))
                i += 1
        d = _write_events(rows)
        got = {
            r.event_type: (r.n_a, r.n_b, r.mean_a, r.mean_b, r.t_stat, r.df_welch)
            for r in q(spark, d).collect()
        }

        byt: dict = {}
        for _i, _ts, uid, et, v in rows:
            if uid is None or v is None:
                continue
            byt.setdefault(et, {"a": [], "b": []})["a" if uid % 2 == 0 else "b"].append(v)
        want = {}
        for et, co in byt.items():
            A, B = co["a"], co["b"]
            na, nb = float(len(A)), float(len(B))
            sa = sum(rhu(v * 100) for v in A) / 100 if A else None
            sb = sum(rhu(v * 100) for v in B) / 100 if B else None
            sa2 = sum(rhu(v * v * 10000) for v in A) / 10000 if A else None
            sb2 = sum(rhu(v * v * 10000) for v in B) / 10000 if B else None
            va = vb = None
            if na > 1:
                x = (sa2 - sa * sa / na) / (na - 1.0)
                va = x if x > 0.0 else 0.0
            if nb > 1:
                x = (sb2 - sb * sb / nb) / (nb - 1.0)
                vb = x if x > 0.0 else 0.0
            se2 = None if (va is None or vb is None) else va / na + vb / nb
            mean_a, mean_b = tdiv(sa, na), tdiv(sb, nb)
            t_stat = None
            if mean_a is not None and mean_b is not None and se2 is not None:
                t_stat = tdiv(mean_a - mean_b, math.sqrt(se2))
            dfw = None
            if se2 is not None:
                denom = (va / na) * (va / na) / (na - 1.0) + (vb / nb) * (vb / nb) / (nb - 1.0)
                dfw = tdiv(se2 * se2, denom)
            want[et] = (int(na), int(nb), mean_a, mean_b, t_stat, dfw)
        if got != want:
            fails += 1
            bad = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
            print(f"  welch trial {t}: MISMATCH {[(k, got.get(k), want.get(k)) for k in sorted(bad)][:3]}")
    return fails


# ---------------------------------------------------------------------------
# spearman: q_events_spearman vs a Python fractional-rank recount
# ---------------------------------------------------------------------------


def fuzz_spearman(spark, trials: int = 8) -> int:
    """q_events_spearman (fractional average ranks on the dsum grid,
    Pearson on ranks) vs a Python recount. Axes: heavy ties (few distinct
    hourly sums), constant series (rank variance 0 -> NULL rho via
    try_divide on sqrt(0)*sqrt(.)), perfectly monotone pairs (rho exactly
    +-1 modulo the fixed-point grid), single-shared-hour pairs, null-ts
    hourly rows never joining."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    q = get_query("q_events_spearman").fn

    def rhu(x):
        return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    fails = 0
    for t in range(trials):
        rng = random.Random(43000 + t)
        hostile = t % 2 == 0
        rows = []
        i = 0
        n_hours = rng.randint(2, 18)
        for h in range(n_hours):
            for et in ("a", "b", "c"):
                r = rng.random()
                if hostile and et == "c":
                    v = 4.0  # constant series: zero rank variance
                elif hostile and r < 0.4:
                    v = float(rng.randint(0, 2))  # heavy ties
                else:
                    v = round(rng.uniform(-30, 30), 2)
                if rng.random() < 0.85:  # some missing hours
                    rows.append((i, BASE + timedelta(hours=h, minutes=rng.randint(0, 59)), 1, et, v))
                    i += 1
        if hostile:
            rows.append((i, None, 1, "a", 9.9)); i += 1
        d = _write_events(rows)
        got = {
            (r.type_a, r.type_b): (r.n_hours, r.rho) for r in q(spark, d).collect()
        }

        hourly: dict = {}
        for _i, ts, _u, et, v in rows:
            if ts is None:
                continue
            h = ts.replace(minute=0, second=0, microsecond=0)
            hourly[(et, h)] = hourly.get((et, h), 0) + rhu(v * 100)
        series: dict = {}
        for (et, h), cents in hourly.items():
            series.setdefault(et, {})[h] = cents / 100
        want = {}
        ts_ = sorted(series)
        for ai in range(len(ts_)):
            for bi in range(ai + 1, len(ts_)):
                a, b = ts_[ai], ts_[bi]
                hs = sorted(set(series[a]) & set(series[b]))
                if not hs:
                    continue
                va = [series[a][h] for h in hs]
                vb = [series[b][h] for h in hs]

                def ranks(vals):
                    return [
                        (1 + sum(1 for w in vals if w < v))
                        + (sum(1 for w in vals if w == v) - 1) / 2.0
                        for v in vals
                    ]

                rx, ry = ranks(va), ranks(vb)
                n = float(len(hs))
                sx = sum(rhu(r * 10) for r in rx) / 10
                sy = sum(rhu(r * 10) for r in ry) / 10
                sxy = sum(rhu(x * y * 100) for x, y in zip(rx, ry)) / 100
                sx2 = sum(rhu(x * x * 100) for x in rx) / 100
                sy2 = sum(rhu(y * y * 100) for y in ry) / 100
                dx = n * sx2 - sx * sx
                dy = n * sy2 - sy * sy
                denom = math.sqrt(dx if dx > 0.0 else 0.0) * math.sqrt(dy if dy > 0.0 else 0.0)
                num = n * sxy - sx * sy
                rho = None if denom == 0 else num / denom
                want[(a, b)] = (int(n), rho)
        if got != want:
            fails += 1
            bad = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
            print(f"  spearman trial {t}: MISMATCH {[(k, got.get(k), want.get(k)) for k in sorted(bad)][:3]}")
    return fails


# ---------------------------------------------------------------------------
# unigram/bigram LM scores + split: CCNet filters and the hash split rule
# ---------------------------------------------------------------------------


def fuzz_lm(spark, trials: int = 8) -> int:
    """q_llm_unigram_logprob + q_llm_bigram_logprob (corpus-own LM MLE
    scores, micro-nat dsum accumulation) vs Python recounts. Axes:
    single-token docs (0 bigrams -> n_bigrams 0, NULL score), empty/null
    docs (row kept, n 0, NULL), whole-corpus-duplicate docs (ctf == total
    -> ln(1) = 0 exactly; mean exactly 0), word-salad docs (common words,
    impossible order — the bigram score must drop), repeated-bigram docs
    (bf > 1 weighting)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    qu = get_query("q_llm_unigram_logprob").fn
    qb = get_query("q_llm_bigram_logprob").fn

    def rhu(x):
        return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    fails = 0
    for t in range(trials):
        rng = random.Random(44000 + t)
        hostile = t % 2 == 0
        rows = []
        for i in range(rng.randint(3, 90)):
            r = rng.random()
            if hostile and r < 0.08:
                text = None
            elif hostile and r < 0.16:
                text = rng.choice(["", "solo"])  # empty / single-token
            elif hostile and r < 0.3:
                text = "same same same"  # self-duplicating tokens/bigrams
            elif hostile and r < 0.45:
                # word salad: corpus-common words, shuffled order
                ws = ["the", "of", "and", "to", "in"] * 2
                rng.shuffle(ws)
                text = " ".join(ws)
            else:
                text = " ".join(
                    rng.choice(["the", "of", "and", "quick", "fox", f"r{rng.randint(0,20)}"])
                    for _ in range(rng.randint(1, 25))
                )
            rows.append((i, text, "en", "s"))
        d = _write_documents(rows)
        gu = {r.doc_id: (r.n_tokens, r.mean_logprob) for r in qu(spark, d).collect()}
        gb = {r.doc_id: (r.n_bigrams, r.mean_logprob) for r in qb(spark, d).collect()}

        toks = {i: _tokens(txt) for i, txt, _l, _s in rows}
        ctf: dict = {}
        for v in toks.values():
            for w in v:
                ctf[w] = ctf.get(w, 0) + 1
        total = sum(ctf.values())
        wu = {}
        for i, v in toks.items():
            n = len(v)
            if n == 0:
                wu[i] = (0, None)
                continue
            tf: dict = {}
            for w in v:
                tf[w] = tf.get(w, 0) + 1
            micro = sum(rhu(c * math.log(ctf[w] / total) * 1000000) for w, c in tf.items())
            wu[i] = (n, (micro / 1000000) / n)
        if gu != wu:
            fails += 1
            bad = {k for k in set(gu) | set(wu) if gu.get(k) != wu.get(k)}
            print(f"  lm(uni) trial {t}: MISMATCH {[(k, gu.get(k), wu.get(k)) for k in sorted(bad)][:3]}")

        cbf: dict = {}
        ctx: dict = {}
        for v in toks.values():
            for a, b in zip(v, v[1:]):
                cbf[(a, b)] = cbf.get((a, b), 0) + 1
                ctx[a] = ctx.get(a, 0) + 1
        wb = {}
        for i, v in toks.items():
            bigs = list(zip(v, v[1:]))
            if not bigs:
                wb[i] = (0, None)
                continue
            bf: dict = {}
            for g in bigs:
                bf[g] = bf.get(g, 0) + 1
            micro = sum(
                rhu(c * math.log(cbf[g] / ctx[g[0]]) * 1000000) for g, c in bf.items()
            )
            wb[i] = (len(bigs), (micro / 1000000) / len(bigs))
        if gb != wb:
            fails += 1
            bad = {k for k in set(gb) | set(wb) if gb.get(k) != wb.get(k)}
            print(f"  lm(bi) trial {t}: MISMATCH {[(k, gb.get(k), wb.get(k)) for k in sorted(bad)][:3]}")
    return fails


def fuzz_split(spark, trials: int = 8) -> int:
    """q_llm_split (md5-prefix 80/10/10 hash split on text, per-lang
    counts) vs a Python hashlib recount of the declared bucket rule.
    Axes: null text (COALESCE '' hashes), duplicate texts (identical
    buckets — determinism IS the contract), null lang groups, texts
    engineered across all three splits."""
    import hashlib

    q = get_query("q_llm_split").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(45000 + t)
        hostile = t % 2 == 0
        rows = []
        dup_pool = []
        for i in range(rng.randint(3, 150)):
            lang = rng.choice(["en", "de", None] if hostile else ["en", "de", "fr"])
            r = rng.random()
            if hostile and r < 0.08:
                text = None
            elif hostile and r < 0.3 and dup_pool:
                text = rng.choice(dup_pool)
            else:
                text = " ".join(f"s{rng.randint(0, 99)}" for _ in range(rng.randint(0, 12)))
                dup_pool.append(text)
            rows.append((i, text, lang, "s"))
        d = _write_documents(rows)
        got = {(r.lang, r.split): r.n for r in q(spark, d).collect()}

        want: dict = {}
        for _i, text, lang, _s in rows:
            b = int(hashlib.md5((text or "").encode()).hexdigest()[:4], 16) % 10
            split = "train" if b < 8 else ("val" if b == 8 else "test")
            want[(lang, split)] = want.get((lang, split), 0) + 1
        if got != want:
            fails += 1
            bad = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
            print(f"  split trial {t}: MISMATCH {[(k, got.get(k), want.get(k)) for k in sorted(bad, key=str)][:4]}")
    return fails


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("fuzz13")
    total = 0
    ran = []
    if which in ("pack", "all"):
        f = fuzz_pack(spark)
        ran.append(("pack", 10, f))
        total += f
    if which in ("bpe", "all"):
        f = fuzz_bpe(spark)
        ran.append(("bpe", 10, f))
        total += f
    if which in ("bpe_train", "all"):
        f = fuzz_bpe_train(spark)
        ran.append(("bpe_train", 8, f))
        total += f
    if which in ("gapfill", "all"):
        f = fuzz_gapfill(spark)
        ran.append(("gapfill", 10, f))
        total += f
    if which in ("path", "all"):
        f = fuzz_path(spark)
        ran.append(("path", 10, f))
        total += f
    if which in ("ewma", "all"):
        f = fuzz_ewma(spark)
        ran.append(("ewma", 10, f))
        total += f
    if which in ("wsample", "all"):
        f = fuzz_wsample(spark)
        ran.append(("wsample", 8, f))
        total += f
    if which in ("bm25", "all"):
        f = fuzz_bm25(spark)
        ran.append(("bm25", 8, f))
        total += f
    if which in ("leakage", "all"):
        f = fuzz_leakage(spark)
        ran.append(("leakage", 8, f))
        total += f
    if which in ("hh", "all"):
        f = fuzz_hh(spark)
        ran.append(("hh", 8, f))
        total += f
    if which in ("diff", "all"):
        f = fuzz_diff(spark)
        ran.append(("diff", 8, f))
        total += f
    if which in ("chunk", "all"):
        f = fuzz_chunk(spark)
        ran.append(("chunk", 8, f))
        total += f
    if which in ("rollup", "all"):
        f = fuzz_rollup(spark)
        ran.append(("rollup", 8, f))
        total += f
    if which in ("canonical", "all"):
        f = fuzz_canonical(spark)
        ran.append(("canonical", 8, f))
        total += f
    if which in ("substring", "all"):
        f = fuzz_substring(spark)
        ran.append(("substring", 8, f))
        total += f
    if which in ("tfidf", "all"):
        f = fuzz_tfidf(spark)
        ran.append(("tfidf", 8, f))
        total += f
    if which in ("budget", "all"):
        f = fuzz_budget(spark)
        ran.append(("budget", 8, f))
        total += f
    if which in ("tempmix", "all"):
        f = fuzz_tempmix(spark)
        ran.append(("tempmix", 8, f))
        total += f
    if which in ("int8", "all"):
        f = fuzz_int8(spark)
        ran.append(("int8", 8, f))
        total += f
    if which in ("langid", "all"):
        f = fuzz_langid(spark)
        ran.append(("langid", 8, f))
        total += f
    if which in ("funnel", "all"):
        f = fuzz_funnel(spark)
        ran.append(("funnel", 8, f))
        total += f
    if which in ("fuzzy", "all"):
        f = fuzz_fuzzy(spark)
        ran.append(("fuzzy", 6, f))
        total += f
    if which in ("latency", "all"):
        f = fuzz_latency(spark)
        ran.append(("latency", 8, f))
        total += f
    if which in ("zscore", "all"):
        f = fuzz_zscore(spark)
        ran.append(("zscore", 8, f))
        total += f
    if which in ("robust", "all"):
        f = fuzz_robust(spark)
        ran.append(("robust", 8, f))
        total += f
    if which in ("quality", "all"):
        f = fuzz_quality(spark)
        ran.append(("quality", 8, f))
        total += f
    if which in ("winsorize", "all"):
        f = fuzz_winsorize(spark)
        ran.append(("winsorize", 8, f))
        total += f
    if which in ("novelty", "all"):
        f = fuzz_novelty(spark)
        ran.append(("novelty", 8, f))
        total += f
    if which in ("affinity", "all"):
        f = fuzz_affinity(spark)
        ran.append(("affinity", 8, f))
        total += f
    if which in ("welch", "all"):
        f = fuzz_welch(spark)
        ran.append(("welch", 8, f))
        total += f
    if which in ("spearman", "all"):
        f = fuzz_spearman(spark)
        ran.append(("spearman", 8, f))
        total += f
    if which in ("lm", "all"):
        f = fuzz_lm(spark)
        ran.append(("lm", 8, f))
        total += f
    if which in ("split", "all"):
        f = fuzz_split(spark)
        ran.append(("split", 8, f))
        total += f
    for name, trials, f in ran:
        print(f"{name}: {trials} trials, {f} failures")
    print(f"TOTAL FAILURES: {total}")
    sys.exit(1 if total else 0)


if __name__ == "__main__":
    main()
