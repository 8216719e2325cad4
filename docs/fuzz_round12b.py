"""Round-12b randomized differential sweep — the mirrored-window family.

The round-12 sweep program (SCALE.md) replays a kernel's REGISTERED query
verbatim on randomized hostile fixtures and checks it against an
INDEPENDENT brute-force Python reference — independent meaning a different
formulation of the declared semantics, not a transcription of the engine's
plan. It exists because the dual-scale DuckDB oracle replay cannot catch a
bug both engines share: every target here has an oracle that mirrors the
engine's window/HOF rule text, so a misunderstanding of the RULE (as
opposed to a mis-execution of it) passes the hash gate. That class is real:
the same sweep found connected_components' one-hop fragmentation in round
12 after three rounds of green hashes.

Targets (each fuzzed on N randomized fixtures with hostile axes):

  asof     q_asof_join          vs O(n*m) "latest view with (ts,event_id)
                                strictly below the purchase's" nested loop.
                                Axes: equal timestamps across types, view
                                and purchase at the SAME ts (row-frame
                                strictness), users with no views /
                                no purchases, null ts / event_type.
  scd2     q_events_scd2        vs a per-user sorted fold (collapse
                                consecutive duplicate states, close
                                intervals at the next change). Axes:
                                equal-ts state changes (tie-break),
                                single-event users, all-same-state users,
                                null ts/state rows (excluded by contract).
  interval q_stream_interval_   vs brute nested loops with the inclusive
           join_batch (+_left)  [p.ts - 1h, p.ts] band. Axes: views exactly
                                ON the 1-hour boundary and exactly AT the
                                purchase ts, unmatched purchases (left),
                                null ts rows.
  gopher   q_llm_repetition_    vs a collections.Counter recount of the
           rules                declared fractions (count*n / n_tok).
                                Axes: pathological repetition (one doc =
                                one bigram repeated), exactly-3-token docs,
                                tab/newline whitespace, docs under the
                                3-token floor, null/empty text.
  cap      q_llm_domain_cap     vs a hashlib.md5 reorder in Python
                                (md5(text or ''), doc_id) per source.
                                Axes: duplicate texts (md5 ties -> doc_id
                                tie-break), null text, sources exactly at /
                                below / above DOMAIN_CAP.
  span     q_llm_contamination_ vs a Python recount of positioned shingles
           span                 -> bench membership -> consecutive-hit
                                islands. Axes: tiny-vocab shared shingles,
                                tiled repetition, hostile whitespace.
  containment q_dedup_          vs a Python recount of distinct shingle
           containment          sets -> pairwise |A∩B|/|A| -> best
                                container. Axes: planted wholesale
                                containment, tiny vocab, hostile docs.

Run:  python docs/fuzz_round12b.py
      [asof|scd2|interval|gopher|span|containment|cap|all]

Results are recorded in SCALE.md ("Round 12" sweep ledger); canonical
hostile shapes are promoted to committed tests in tests/test_properties.py.
"""

from __future__ import annotations

import hashlib
import random
import re
import sys
import tempfile
from collections import Counter
from datetime import datetime, timedelta

import duckdb

sys.path.insert(0, ".")

from hadoop_web_browsing_logs_spark.plans.registry import get_query
from hadoop_web_browsing_logs_spark.session import get_spark

BASE = datetime(2024, 1, 1)


def _write_events(rows) -> str:
    """rows: (event_id, ts|None, user_id|None, event_type|None, value)."""
    d = tempfile.mkdtemp(prefix="fuzz_events_")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany("INSERT INTO e VALUES (?,?,?,?,?,?)", [r + (None,) for r in rows])
    con.execute(f"COPY e TO '{d}/events.parquet' (FORMAT PARQUET)")
    return d


def _write_documents(rows) -> str:
    """rows: (doc_id, text|None, lang, source)."""
    d = tempfile.mkdtemp(prefix="fuzz_docs_")
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


def _rand_events(rng: random.Random, n: int, hostile: bool):
    """Random event stream. Hostile mode concentrates timestamps on a tiny
    grid (many exact ties, including cross-type same-instant) and plants
    null ts / event_type rows."""
    rows = []
    types = ["view", "purchase", "click"]
    grid = [BASE + timedelta(minutes=15 * k) for k in range(6 if hostile else 400)]
    for i in range(n):
        ts = rng.choice(grid)
        # exact 1-hour-boundary pairs for the interval band
        if hostile and rng.random() < 0.2:
            ts = rng.choice(grid) - timedelta(hours=1)
        et = rng.choice(types)
        uid = rng.randint(1, 3 if hostile else 20)
        if hostile and rng.random() < 0.05:
            ts = None
        if hostile and rng.random() < 0.05:
            et = None
        rows.append((i, ts, uid, et, round(rng.uniform(0, 100), 2)))
    return rows


def _key(ts, eid):
    return (ts, eid)


def fuzz_asof(spark, trials: int = 12) -> int:
    q = get_query("q_asof_join").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(1000 + t)
        rows = _rand_events(rng, rng.randint(5, 120), hostile=t % 2 == 0)
        d = _write_events(rows)
        got = {
            (r.user_id, r.ts, r.last_view_ts, r.secs_since_view)
            for r in q(spark, d).collect()
        }
        # independent brute force: for each purchase, the max view ts among
        # ALL events with (ts, event_id) lexicographically below it.
        # Spark sorts NULL ts FIRST ascending, so null-ts rows precede every
        # real-ts row in the window frame; replicate via a sort key.
        def sk(r):
            return (r[1] is not None, r[1], r[0])

        want = set()
        for p in rows:
            if p[3] != "purchase":
                continue
            cand = [
                v[1]
                for v in rows
                if v[3] == "view"
                and v[2] == p[2]  # same user: the window partitions by user_id
                and v[1] is not None
                and sk(v) < sk(p)
            ]
            lv = max(cand) if cand else None
            secs = None
            if lv is not None and p[1] is not None:
                secs = int((p[1] - lv).total_seconds())
            want.add((p[2], p[1], lv, secs))
        if got != want:
            fails += 1
            print(f"  asof trial {t}: MISMATCH\n    only-engine={got - want}\n    only-brute={want - got}")
    return fails


def fuzz_scd2(spark, trials: int = 12) -> int:
    q = get_query("q_events_scd2").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(2000 + t)
        rows = _rand_events(rng, rng.randint(3, 120), hostile=t % 2 == 0)
        d = _write_events(rows)
        got = {
            (r.user_id, r.state, r.valid_from, r.valid_to)
            for r in q(spark, d).collect()
        }
        # independent fold: per user, sort by (ts, event_id), keep rows whose
        # state differs from the previous kept-or-not row's state, close each
        # kept row at the NEXT KEPT row's ts.
        byu: dict = {}
        for r in rows:
            if r[1] is None or r[3] is None:
                continue
            byu.setdefault(r[2], []).append(r)
        want = set()
        for uid, evs in byu.items():
            evs.sort(key=lambda r: (r[1], r[0]))
            kept = []
            prev_state = object()
            for r in evs:
                if r[3] != prev_state:
                    kept.append(r)
                prev_state = r[3]
            for i, r in enumerate(kept):
                vt = kept[i + 1][1] if i + 1 < len(kept) else None
                want.add((uid, r[3], r[1], vt))
        if got != want:
            fails += 1
            print(f"  scd2 trial {t}: MISMATCH\n    only-engine={got - want}\n    only-fold={want - got}")
    return fails


def fuzz_interval(spark, trials: int = 10) -> int:
    qi = get_query("q_stream_interval_join_batch").fn
    ql = get_query("q_stream_interval_join_left_batch").fn
    fails = 0
    hour = timedelta(hours=1)
    for t in range(trials):
        rng = random.Random(3000 + t)
        rows = _rand_events(rng, rng.randint(5, 120), hostile=t % 2 == 0)
        d = _write_events(rows)
        views = [r for r in rows if r[3] == "view" and r[1] is not None]
        purch = [r for r in rows if r[3] == "purchase" and r[1] is not None]
        want_inner = set()
        for p in purch:
            for v in views:
                if v[2] == p[2] and p[1] - hour <= v[1] <= p[1]:
                    want_inner.add((p[2], p[0], p[1], v[0], v[1], p[4]))
        got_inner = {
            (r.p_user, r.purchase_id, r.purchase_ts, r.view_id, r.view_ts, r.value)
            for r in qi(spark, d).collect()
        }
        # the inner twin does NOT pre-filter null ts (the join condition
        # drops them); null-ts purchases/views simply never match
        if got_inner != want_inner:
            fails += 1
            print(f"  interval-inner trial {t}: MISMATCH only-engine={got_inner - want_inner} only-brute={want_inner - got_inner}")
        want_left = set(want_inner)
        matched = {p_id for (_, p_id, *_rest) in want_inner}
        for p in purch:
            if p[0] not in matched:
                want_left.add((p[2], p[0], p[1], None, None, p[4]))
        got_left = {
            (r.p_user, r.purchase_id, r.purchase_ts, r.view_id, r.view_ts, r.value)
            for r in ql(spark, d).collect()
        }
        if got_left != want_left:
            fails += 1
            print(f"  interval-left trial {t}: MISMATCH only-engine={got_left - want_left} only-brute={want_left - got_left}")
    return fails


_WORDS = ["aa", "bb", "cc", "dd", "ee", "AA", "x"]


def _rand_doc(rng: random.Random, hostile: bool) -> str | None:
    r = rng.random()
    if hostile and r < 0.06:
        return None
    if hostile and r < 0.12:
        return "   "
    n = rng.randint(0, 6) if rng.random() < 0.3 else rng.randint(3, 40)
    toks = [rng.choice(_WORDS) for _ in range(n)]
    if hostile and rng.random() < 0.4 and n >= 4:
        # pathological repetition: tile one bigram across the doc
        a, b = rng.choice(_WORDS), rng.choice(_WORDS)
        toks = [a, b] * (n // 2)
    seps = [" ", "  ", "\t", "\n"] if hostile else [" "]
    out = ""
    for i, tok in enumerate(toks):
        out += (rng.choice(seps) if i else "") + tok
    if hostile and rng.random() < 0.3:
        out = " " + out + "\t"
    return out


def fuzz_gopher(spark, trials: int = 10) -> int:
    from hadoop_web_browsing_logs_spark.operators.llm_pipeline import (
        DUP2_MAX,
        DUP3_MAX,
        TOP2_MAX,
    )

    q = get_query("q_llm_repetition_rules").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(4000 + t)
        docs = [
            (i, _rand_doc(rng, hostile=t % 2 == 0), rng.choice(["en", "de"]), "s")
            for i in range(rng.randint(3, 60))
        ]
        d = _write_documents(docs)
        got = {
            (r.lang, r.n_docs, r.pass_top2, r.pass_dup2, r.pass_dup3, r.pass_all)
            for r in q(spark, d).collect()
        }
        # independent recount of the declared formula
        agg: dict = {}
        for _id, text, lang, _s in docs:
            toks = [w for w in re.split(r"\s+", (text or "").strip().lower()) if w]
            if len(toks) < 3:
                continue
            n_tok = len(toks)
            g2 = Counter(" ".join(toks[i : i + 2]) for i in range(n_tok - 1))
            g3 = Counter(" ".join(toks[i : i + 3]) for i in range(n_tok - 2))
            top2 = max(g2.values()) * 2 / n_tok
            dup2 = sum(c for c in g2.values() if c >= 2) * 2 / n_tok
            dup3 = sum(c for c in g3.values() if c >= 2) * 3 / n_tok
            a = agg.setdefault(lang, [0, 0, 0, 0, 0])
            a[0] += 1
            a[1] += top2 <= TOP2_MAX
            a[2] += dup2 <= DUP2_MAX
            a[3] += dup3 <= DUP3_MAX
            a[4] += top2 <= TOP2_MAX and dup2 <= DUP2_MAX and dup3 <= DUP3_MAX
        want = {(lang, *a) for lang, a in agg.items()}
        if got != want:
            fails += 1
            print(f"  gopher trial {t}: MISMATCH\n    engine={sorted(got)}\n    recount={sorted(want)}")
    return fails


def fuzz_span(spark, trials: int = 10) -> int:
    """q_llm_contamination_span vs a Python recount: positioned 5-gram
    shingles, bench = distinct shingles of doc_id % 97 == 0 docs, islands of
    consecutive hit positions. Axes: docs built from a tiny vocab so shared
    shingles abound, doc 0 and 97 are bench at n>=98, tiled repetition, and
    whitespace-hostile separators."""
    q = get_query("q_llm_contamination_span").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(6000 + t)
        n = rng.randint(4, 120)
        docs = [
            (i, _rand_doc(rng, hostile=t % 2 == 0), "en", "s") for i in range(n)
        ]
        d = _write_documents(docs)
        got = {
            (r.doc_id, r.n_hit_positions, r.max_span_shingles, r.max_span_tokens)
            for r in q(spark, d).collect()
        }
        def toks(text):
            return [w for w in re.split(r"\s+", (text or "").strip().lower()) if w]

        def sh(text):
            tk = toks(text)
            return [" ".join(tk[i : i + 5]) for i in range(len(tk) - 4)]

        bench = {s for i, text, _l, _s in docs if i % 97 == 0 for s in sh(text)}
        want = set()
        for i, text, _l, _s in docs:
            if i % 97 == 0:
                continue
            hits = [p for p, s in enumerate(sh(text), start=1) if s in bench]
            if not hits:
                continue
            spans, cur = [], 1
            for a, b in zip(hits, hits[1:]):
                if b == a + 1:
                    cur += 1
                else:
                    spans.append(cur)
                    cur = 1
            spans.append(cur)
            want.add((i, len(hits), max(spans), max(spans) + 4))
        if got != want:
            fails += 1
            print(f"  span trial {t}: MISMATCH only-engine={sorted(got - want)[:4]} only-recount={sorted(want - got)[:4]}")
    return fails


def fuzz_funnel(spark, trials: int = 10) -> int:
    """q_events_funnel vs a per-user Python scan of the declared rule:
    first view; first click STRICTLY after it within <=24h (inclusive
    boundary); first purchase likewise after the click. Axes: same-instant
    ties, events exactly ON the 24h boundary (the 15-min grid aligns),
    null ts/type/user (null users form one real funnel group, as the
    window partitioning does)."""
    from datetime import timedelta

    q = get_query("q_events_funnel").fn
    day = timedelta(hours=24)
    fails = 0
    for t in range(trials):
        rng = random.Random(8000 + t)
        rows = _rand_events(rng, rng.randint(4, 140), hostile=t % 2 == 0)
        if t % 3 == 0:
            rows = [(i, ts, None if rng.random() < 0.1 else u, et, v)
                    for (i, ts, u, et, v) in rows]
        d = _write_events(rows)
        r = q(spark, d).collect()[0]
        got = (r.n_users, r.n_view, r.n_view_click, r.n_full_funnel)
        byu: dict = {}
        for row in rows:
            byu.setdefault(row[2], []).append(row)
        nv = nc = np_ = 0
        for evs in byu.values():
            views = [r_[1] for r_ in evs if r_[3] == "view" and r_[1] is not None]
            fv = min(views) if views else None
            fc = fp = None
            if fv is not None:
                clicks = [r_[1] for r_ in evs if r_[3] == "click" and r_[1] is not None
                          and fv < r_[1] <= fv + day]
                fc = min(clicks) if clicks else None
            if fc is not None:
                purch = [r_[1] for r_ in evs if r_[3] == "purchase" and r_[1] is not None
                         and fc < r_[1] <= fc + day]
                fp = min(purch) if purch else None
            nv += fv is not None
            nc += fc is not None
            np_ += fp is not None
        want = (len(byu), nv, nc, np_)
        if got != want:
            fails += 1
            print(f"  funnel trial {t}: engine={got} brute={want}")
    return fails


def fuzz_retention(spark, trials: int = 8) -> int:
    """q_events_retention vs a Python replay: per non-null user, distinct
    epoch-week indices; cohort = earliest REAL week; one (cohort,
    offset) cell per active week. Axes: multi-week spreads, users with
    only null-ts events (cohort NULL, offset NULL — a real cell), week
    boundaries."""
    from datetime import timedelta

    q = get_query("q_events_retention").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(9000 + t)
        rows = [
            (i, ts + timedelta(weeks=rng.randint(0, 5)) if ts is not None else None, u, et, v)
            for (i, ts, u, et, v) in _rand_events(rng, rng.randint(4, 140), hostile=t % 2 == 0)
        ]
        d = _write_events(rows)
        got = {
            (r.cohort_week, r.week_offset): r.n_users for r in q(spark, d).collect()
        }
        byu: dict = {}
        for (_i, ts, u, _et, _v) in rows:
            if u is None:
                continue
            widx = int(ts.timestamp()) // 604800 if ts is not None else None
            byu.setdefault(u, set()).add(widx)
        cells: dict = {}
        for weeks in byu.values():
            real = [w for w in weeks if w is not None]
            cohort = min(real) if real else None
            for w in weeks:
                key = (cohort, w - cohort if (w is not None and cohort is not None) else None)
                cells[key] = cells.get(key, 0) + 1
        if got != cells:
            fails += 1
            print(f"  retention trial {t}: only-engine={dict(set(got.items()) - set(cells.items()))} only-brute={dict(set(cells.items()) - set(got.items()))}")
    return fails


def fuzz_attribution(spark, trials: int = 10) -> int:
    """q_events_attribution vs a per-purchase Python scan: candidate views
    are same-user within the inclusive [p.ts - 1h, p.ts] band; credit the
    max (view_ts, view_id) struct; unmatched purchases emit a null credit
    with n=0. Axes: views exactly ON the band edges, same-instant ties
    resolved by id, null ts/user purchases (never match, still emitted)."""
    from datetime import timedelta

    q = get_query("q_events_attribution").fn
    hour = timedelta(hours=1)
    fails = 0
    for t in range(trials):
        rng = random.Random(10000 + t)
        rows = _rand_events(rng, rng.randint(4, 140), hostile=t % 2 == 0)
        d = _write_events(rows)
        got = {
            (r.purchase_id, r.user_id, r.purchase_ts, r.value,
             r.attributed_view_ts, r.attributed_view_id, r.n_candidate_views)
            for r in q(spark, d).collect()
        }
        views = [r_ for r_ in rows if r_[3] == "view" and r_[1] is not None]
        want = set()
        for p in rows:
            if p[3] != "purchase":
                continue
            cand = [
                (v[1], v[0]) for v in views
                if p[1] is not None and v[2] == p[2]
                and p[1] - hour <= v[1] <= p[1]
            ]
            best = max(cand) if cand else (None, None)
            want.add((p[0], p[2], p[1], p[4], best[0], best[1], len(cand)))
        if got != want:
            fails += 1
            print(f"  attribution trial {t}: only-engine={sorted(got - want)[:4]} only-brute={sorted(want - got)[:4]}")
    return fails


def fuzz_containment(spark, trials: int = 8) -> int:
    """q_dedup_containment vs a Python recount: distinct 5-gram shingle
    sets -> pairwise |A∩B|/|A| -> best container per >=tau-covered doc
    (max containment, min container id) + container count. Axes: tiny
    vocab (shared shingles abound), tiled repetition, whitespace-hostile
    separators, null/short docs, plus one planted wholesale containment."""
    from hadoop_web_browsing_logs_spark.operators.dedup import CONTAINMENT_TAU

    q = get_query("q_dedup_containment").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(7000 + t)
        docs = [
            (i, _rand_doc(rng, hostile=t % 2 == 0), "en", "s")
            for i in range(rng.randint(6, 70))
        ]
        if docs and rng.random() < 0.7:
            base = " ".join(rng.choice(_WORDS) for _ in range(10))
            docs.append((len(docs), base, "en", "s"))
            docs.append((len(docs), f"zz0 zz1 zz2 zz3 zz4 {base}", "en", "s"))
        d = _write_documents(docs)
        got = {
            (r.doc_id, r.container_id, r.containment, r.n_containers)
            for r in q(spark, d).collect()
        }

        def shset(text):
            tk = [w for w in re.split(r"\s+", (text or "").strip().lower()) if w]
            return {" ".join(tk[i : i + 5]) for i in range(len(tk) - 4)}

        sets = {i: shset(text) for i, text, _l, _s in docs}
        sets = {i: s for i, s in sets.items() if s}
        want = set()
        for a, sa in sets.items():
            hits = [
                (len(sa & sb) / len(sa), b)
                for b, sb in sets.items()
                if b != a and len(sa & sb) / len(sa) >= CONTAINMENT_TAU
            ]
            if hits:
                best = max(hits, key=lambda h: (h[0], -h[1]))
                want.add((a, best[1], best[0], len(hits)))
        if got != want:
            fails += 1
            print(f"  containment trial {t}: MISMATCH only-engine={sorted(got - want)[:4]} only-recount={sorted(want - got)[:4]}")
    return fails


def fuzz_cap(spark, trials: int = 8) -> int:
    from hadoop_web_browsing_logs_spark.operators.llm_pipeline import DOMAIN_CAP

    q = get_query("q_llm_domain_cap").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(5000 + t)
        n = rng.randint(5, 3 * DOMAIN_CAP)
        texts = ["dup text"] * (n // 3) + [
            None if rng.random() < 0.1 else f"doc {rng.randint(0, n)}"
            for _ in range(n - n // 3)
        ]
        rng.shuffle(texts)
        docs = [
            (i, texts[i], "en", rng.choice(["a", "b", "c"])) for i in range(n)
        ]
        d = _write_documents(docs)
        got = {(r.source, r.doc_id) for r in q(spark, d).collect()}
        bysrc: dict = {}
        for i, text, _l, src in docs:
            key = (hashlib.md5((text or "").encode()).hexdigest(), i)
            bysrc.setdefault(src, []).append((key, i))
        want = set()
        for src, items in bysrc.items():
            items.sort()
            want.update((src, i) for _k, i in items[:DOMAIN_CAP])
        if got != want:
            fails += 1
            print(f"  cap trial {t}: MISMATCH only-engine={got - want} only-replay={want - got}")
    return fails


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("fuzz12b", cpus=8)
    total = 0
    for name, fn in [
        ("asof", fuzz_asof),
        ("scd2", fuzz_scd2),
        ("interval", fuzz_interval),
        ("gopher", fuzz_gopher),
        ("funnel", fuzz_funnel),
        ("retention", fuzz_retention),
        ("attribution", fuzz_attribution),
        ("span", fuzz_span),
        ("containment", fuzz_containment),
        ("cap", fuzz_cap),
    ]:
        if which not in ("all", name):
            continue
        f = fn(spark)
        total += f
        print(f"{name}: {'OK' if f == 0 else f'{f} FAILURES'}")
    print(f"TOTAL failures: {total}")
    sys.exit(1 if total else 0)


if __name__ == "__main__":
    main()
