"""Round-14 randomized differential sweep — the graph family.

Extends the fuzz-differential program (docs/fuzz_round12b.py,
docs/fuzz_round13.py, SCALE.md sweep ledger) to the graph kernels VERDICT
r13 item 2 ranked top: the unrolled-CTE PageRank/LPA/BFS oracles share
their DERIVATION with the engine (the DuckDB CTE chain is a
transliteration of the same recurrence), which is exactly the class that
hid connected_components' one-hop fragmentation for 9 rounds. Each family
replays the LIBRARY KERNEL the registered query calls (the registered
queries themselves are pinned to the SF purchase/co-order graphs; the
kernel is where the recurrence lives) on randomized hostile graphs against
an INDEPENDENT reference built from a DIFFERENT formulation of the
declared semantics:

  pagerank  pagerank() both       vs a dense numpy power iteration
            variants (inside      (adjacency MATRIX form — no per-edge
            q_graph_pagerank /    ratio table, no dsum quantization; the
            _dangling)            engine's per-iteration dsum(15) is
                                  absorbed by a 1e-9 tolerance, ~6 orders
                                  above the quantization error and ~6
                                  below any semantic bug). Axes: dangling
                                  nodes (dst-only), ZERO-SUM out-weights
                                  (cancelling +/- w: ratio NULL -> mass
                                  leaks, and the node is NOT in the
                                  redistribution set — it has out-edges),
                                  zero-weight edges, self-loops, varying
                                  iteration counts 1-4.
  lpa       label_propagation()   vs a Python vote-dict fold (argmax by
            (inside q_graph_      max weight, tie -> smallest label) on
            label_propagation)    SYMMETRIZED random graphs per the
                                  documented contract. Axes: massive vote
                                  ties (all-equal weights on small label
                                  domains), zero- and negative-weight
                                  edges, self-loops, star/clique motifs,
                                  iterations 1-4.
  bfs       bfs_frontier()        vs a Python queue BFS (dict of min
            (inside q_graph_      dists, plain FIFO — no frontier/visited
            bfs_frontier)         DataFrame algebra). Axes: directed
                                  cycles, adjacent seeds, seeds with no
                                  edges, disconnected components,
                                  max_hops 1-4, duplicate seed rows.
  reach     the _REACH_BODY       vs a Python walk-count DP (walks[h][v]
            recursive CTE         fold over h<=2 — counts every length-<=K
            (inside q_graph_      walk, not just reachability; dist=MIN
            reachability)         hop). Axes: multi-seed tables (the
                                  registered query runs one seed; the
                                  recursion body is generic), cycles
                                  through the seed, diamond fan-in
                                  (walk counts > 1), self-loops.
  triangles triangle_             vs a Python neighbor-set intersection
            participation()       recount. Axes: adversarial degree skew
            (inside q_graph_      (celebrity hub + chords), overlapping
            triangles)            cliques K4-K6, triangle-free stars and
                                  bipartite graphs (empty result), degree
                                  ties everywhere (the orientation's
                                  (deg, id) tie-break is load-bearing).

Second wave (same round) — the remaining shared-derivation kernels and
the streaming equivalence machinery (VERDICT r13 item 3):

  lloyd        lloyd_kmeans vs an independent Python recount (in-order L2
               fold, struct-min tie-break, dsum(6) HALF_UP, per-dimension
               empty-cluster carry-forward); identical-seed and
               duplicate-of-seed tie axes.
  attribution  q_events_attribution vs a per-purchase Python scan (tie ->
               highest view_id, both interval bounds inclusive, null
               user/ts purchases kept unmatched).
  corr         q_events_correlation vs a five-moment recount (dsum(2)/(4),
               GREATEST clamp, try_divide NULL; constant and linear
               series, NaN/Inf skips, null-ts hours).
  trend        q_events_trend vs a least-squares recount on exact integer
               hour moments (single-hour exclusion, NaN/Inf, null ts).
  chisq        q_events_chisq vs a contingency recount (NEGATIVE user_ids:
               engines' % truncates toward zero, Python's floors — the
               reference mirrors the engines; dof-0 shapes).
  spans        q_llm_contamination_span vs a positioned-shingle scan
               (wholesale copies, edge-position hits, one-gap run splits,
               benchless corpora).
  colloc       q_text_collocations vs a bigram/unigram Counter recount
               (exact-min-count boundary, overlapping self-bigrams,
               HALF_UP PMI at 6 dp).
  domain_cap   q_llm_domain_cap vs an md5-order recount (mega-domains,
               NULL text in over-cap sources, hex ties -> doc_id).
  stream_win / stream_scd2 / stream_interval
               randomized multi-file event TAPES (one parquet file = one
               micro-batch) replayed through readStream vs the batch
               twins — the five registered equiv gates' claim on hostile
               tapes: sessions merging across >=3 micro-batches, hops
               exactly at the gap, late rows exactly at the watermark,
               same-ts SCD2 ties, sentinel-only left-join flushes.

Run:  python docs/fuzz_round14.py [family|all] [trials]

Results land in SCALE.md's sweep ledger; canonical hostile shapes get
promoted to committed regression tests.
"""

from __future__ import annotations

import random
import sys
from collections import defaultdict, deque

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from hadoop_web_browsing_logs_spark.session import get_spark  # noqa: E402


# ---------------------------------------------------------------------------
# graph generators
# ---------------------------------------------------------------------------


def _rand_digraph(rng: random.Random, weighted: bool = True):
    """Random directed (src, dst, w) edge list with hostile structure mixed
    in: dangling sinks, zero-sum out-weights, self-loops, zero weights."""
    n = rng.randint(3, 28)
    nodes = list(range(1, n + 1))
    edges: dict[tuple[int, int], int] = {}
    # random base edges
    for _ in range(rng.randint(n, 4 * n)):
        u, v = rng.choice(nodes), rng.choice(nodes)
        if u == v and rng.random() < 0.7:
            continue  # keep self-loops, but rarer than the draw
        w = rng.choice([0, 1, 1, 2, 3, 5, -2, -1]) if weighted else 1
        edges[(u, v)] = edges.get((u, v), 0) + w  # pre-summed multi-edges
    # force a dangling sink: a node that appears only as dst
    sink = n + 1
    edges[(rng.choice(nodes), sink)] = 3
    # force a zero-sum out-weight node (cancelling +/-): has out-edges, so
    # it is NOT dangling, but its ratio is NULL and its mass leaks
    if weighted and n >= 4 and rng.random() < 0.7:
        z = rng.choice(nodes)
        others = [x for x in nodes if x != z]
        a, b = rng.sample(others, 2)
        # overwrite z's existing out-edges so the sum is exactly zero
        for (u, v) in [k for k in edges if k[0] == z]:
            del edges[(u, v)]
        edges[(z, a)] = 4
        edges[(z, b)] = -4
    return [(u, v, w) for (u, v), w in edges.items()]


def _rand_undirected(rng: random.Random):
    """Random undirected (a, b) a<b simple edge list with triangle-hostile
    motifs: a celebrity hub, overlapping cliques, and tie-heavy degrees."""
    n = rng.randint(4, 26)
    nodes = list(range(1, n + 1))
    edges: set[tuple[int, int]] = set()
    shape = rng.choice(["random", "hub", "cliques", "bipartite", "mixed"])
    if shape in ("random", "mixed"):
        for _ in range(rng.randint(n, 3 * n)):
            a, b = rng.sample(nodes, 2)
            edges.add((min(a, b), max(a, b)))
    if shape in ("hub", "mixed"):
        hub = nodes[0]
        for v in nodes[1:]:
            edges.add((min(hub, v), max(hub, v)))
        # chords among the hub's neighbors -> triangles THROUGH the hub
        for _ in range(rng.randint(0, n)):
            a, b = rng.sample(nodes[1:], 2)
            edges.add((min(a, b), max(a, b)))
    if shape in ("cliques", "mixed"):
        for _ in range(rng.randint(1, 3)):
            k = rng.randint(3, min(6, n))
            clique = rng.sample(nodes, k)
            for i in range(k):
                for j in range(i + 1, k):
                    a, b = clique[i], clique[j]
                    edges.add((min(a, b), max(a, b)))
    if shape == "bipartite":  # triangle-free by construction
        left = nodes[: n // 2]
        right = nodes[n // 2:]
        for _ in range(rng.randint(n, 3 * n)):
            a, b = rng.choice(left), rng.choice(right)
            edges.add((min(a, b), max(a, b)))
    return sorted(edges)


# ---------------------------------------------------------------------------
# pagerank: both variants vs a dense numpy power iteration
# ---------------------------------------------------------------------------


def fuzz_pagerank(spark, trials: int = 24) -> int:
    import numpy as np

    from hadoop_web_browsing_logs_spark.operators.graph import pagerank

    fails = 0
    for t in range(trials):
        rng = random.Random(1400 + t)
        el = _rand_digraph(rng)
        iters = rng.randint(1, 4)
        redistribute = t % 2 == 1
        nodes = sorted({u for u, _, _ in el} | {v for _, v, _ in el})
        idx = {v: i for i, v in enumerate(nodes)}
        n = len(nodes)
        # independent formulation: dense transition MATRIX, float ratios —
        # never the engine's per-edge ratio table or dsum quantization
        ow = defaultdict(int)
        for u, _, w in el:
            ow[u] += w
        m = np.zeros((n, n))
        for u, v, w in el:
            if ow[u] != 0:  # zero-sum out-weight -> NULL ratio -> no mass
                m[idx[u], idx[v]] += w / ow[u]
        has_out = {u for u, _, _ in el}
        dang_mask = np.array([v not in has_out for v in nodes])
        d = 0.85
        pr = np.full(n, 1.0 / n)
        for _ in range(iters):
            contrib = m.T @ pr
            dm = pr[dang_mask].sum() if redistribute else 0.0
            pr = (1 - d) / n + d * (contrib + dm / n)
        expected = {v: pr[idx[v]] for v in nodes}

        df = spark.createDataFrame(el, ["src", "dst", "w"])
        got = {
            r["node"]: r["pr"]
            for r in pagerank(
                df, iterations=iters, redistribute_dangling=redistribute
            ).collect()
        }
        ok = set(got) == set(expected) and all(
            abs(got[v] - expected[v]) < 1e-9 for v in expected
        )
        if not ok:
            fails += 1
            diffs = {
                v: (got.get(v), expected.get(v))
                for v in set(got) | set(expected)
                if v not in got
                or v not in expected
                or abs(got[v] - expected[v]) >= 1e-9
            }
            print(f"  pagerank trial {t} (redist={redistribute}, K={iters}) "
                  f"FAIL: {dict(list(diffs.items())[:4])}")
    print(f"fuzz_pagerank: {trials - fails}/{trials} ok")
    return fails


# ---------------------------------------------------------------------------
# lpa: label_propagation vs a Python vote-dict fold on symmetrized graphs
# ---------------------------------------------------------------------------


def fuzz_lpa(spark, trials: int = 24) -> int:
    from hadoop_web_browsing_logs_spark.operators.graph import label_propagation

    fails = 0
    for t in range(trials):
        rng = random.Random(2400 + t)
        base = _rand_digraph(rng)
        iters = rng.randint(1, 4)
        if rng.random() < 0.4:
            # massive-tie axis: unit weights over a dense small graph
            base = [(u, v, 1) for u, v, _ in base]
        # documented contract: symmetrize for undirected semantics
        # (self-loops delivered once)
        sym: dict[tuple[int, int], int] = {}
        for u, v, w in base:
            sym[(u, v)] = sym.get((u, v), 0) + w
            if u != v:
                sym[(v, u)] = sym.get((v, u), 0) + w
        el = [(u, v, w) for (u, v), w in sym.items()]

        # independent reference: per-iteration defaultdict vote fold
        labels = {v: v for v in {u for u, _, _ in el} | {v for _, v, _ in el}}
        for _ in range(iters):
            votes: dict[int, dict[int, int]] = defaultdict(lambda: defaultdict(int))
            for u, v, w in el:
                if u in labels:
                    votes[v][labels[u]] += w
            labels = {
                v: min(lw.items(), key=lambda kv: (-kv[1], kv[0]))[0]
                for v, lw in votes.items()
            }
        df = spark.createDataFrame(el, ["src", "dst", "w"])
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, iterations=iters).collect()
        }
        if got != labels:
            fails += 1
            diffs = {
                v: (got.get(v), labels.get(v))
                for v in set(got) | set(labels)
                if got.get(v) != labels.get(v)
            }
            print(f"  lpa trial {t} (K={iters}) FAIL: {dict(list(diffs.items())[:5])}")
    print(f"fuzz_lpa: {trials - fails}/{trials} ok")
    return fails


# ---------------------------------------------------------------------------
# bfs: bfs_frontier vs a Python queue BFS
# ---------------------------------------------------------------------------


def fuzz_bfs(spark, trials: int = 24) -> int:
    from hadoop_web_browsing_logs_spark.operators.graph import bfs_frontier

    fails = 0
    for t in range(trials):
        rng = random.Random(3400 + t)
        el = [(u, v) for u, v, _ in _rand_digraph(rng, weighted=False)]
        max_hops = rng.randint(1, 4)
        nodes = sorted({u for u, _ in el} | {v for _, v in el})
        n_seeds = rng.randint(1, max(1, len(nodes) // 4))
        seeds = rng.sample(nodes, n_seeds)
        if rng.random() < 0.4:
            seeds.append(10_000 + t)  # a seed with no edges at all
        seed_rows = seeds + ([seeds[0]] if rng.random() < 0.5 else [])  # dup rows

        # independent reference: plain FIFO multi-source BFS
        adj = defaultdict(list)
        for u, v in el:
            adj[u].append(v)
        dist = {s: 0 for s in seeds}
        q = deque(seeds)
        while q:
            u = q.popleft()
            if dist[u] >= max_hops:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)

        edges = spark.createDataFrame(el, ["src", "dst"])
        seed_df = spark.createDataFrame([(s,) for s in seed_rows], ["node"])
        got = {
            r["node"]: r["dist"]
            for r in bfs_frontier(edges, seed_df, max_hops=max_hops).collect()
        }
        if got != dist:
            fails += 1
            diffs = {
                v: (got.get(v), dist.get(v))
                for v in set(got) | set(dist)
                if got.get(v) != dist.get(v)
            }
            print(f"  bfs trial {t} (hops={max_hops}) FAIL: "
                  f"{dict(list(diffs.items())[:5])}")
    print(f"fuzz_bfs: {trials - fails}/{trials} ok")
    return fails


# ---------------------------------------------------------------------------
# reach: the _REACH_BODY recursive CTE vs a Python walk-count DP
# ---------------------------------------------------------------------------


def fuzz_reach(spark, trials: int = 24) -> int:
    from hadoop_web_browsing_logs_spark.operators.graph import (
        REACH_MAX_HOPS,
        _REACH_BODY,
    )

    fails = 0
    for t in range(trials):
        rng = random.Random(4400 + t)
        el = sorted({(u, v) for u, v, _ in _rand_digraph(rng, weighted=False)})
        nodes = sorted({u for u, _ in el} | {v for _, v in el})
        seeds = sorted(rng.sample(nodes, rng.randint(1, 3)))
        if rng.random() < 0.5 and seeds:
            # cycle through a seed: guarantees the seed is re-entered at
            # hop <= 2, so its n_walks > 1 while its dist stays 0
            s = seeds[0]
            back = rng.choice(nodes)
            el = sorted(set(el) | {(s, back), (back, s)})

        # independent reference: walks[h][v] DP over h <= REACH_MAX_HOPS —
        # counts every length-<=K walk (multiplicities), dist = min hop
        adj = defaultdict(list)
        for u, v in el:
            adj[u].append(v)
        walks = [defaultdict(int)]
        for s in seeds:
            walks[0][s] += 1
        for h in range(REACH_MAX_HOPS):
            nxt: dict[int, int] = defaultdict(int)
            for u, c in walks[h].items():
                for v in adj[u]:
                    nxt[v] += c
            walks.append(nxt)
        expected = {}
        for h, layer in enumerate(walks):
            for v, c in layer.items():
                if v not in expected:
                    expected[v] = [h, 0]
                expected[v][1] += c
        exp = {v: (d, c) for v, (d, c) in expected.items()}

        edges = spark.createDataFrame(el, ["src", "dst"])
        seed_df = spark.createDataFrame([(s,) for s in seeds], ["node"])
        res = spark.sql(
            f"WITH RECURSIVE {_REACH_BODY}", seeds=seed_df, edges=edges
        ).collect()
        got = {r["node"]: (r["dist"], r["n_walks"]) for r in res}
        if got != exp:
            fails += 1
            diffs = {
                v: (got.get(v), exp.get(v))
                for v in set(got) | set(exp)
                if got.get(v) != exp.get(v)
            }
            print(f"  reach trial {t} FAIL: {dict(list(diffs.items())[:5])}")
    print(f"fuzz_reach: {trials - fails}/{trials} ok")
    return fails


# ---------------------------------------------------------------------------
# triangles: triangle_participation vs a neighbor-set intersection recount
# ---------------------------------------------------------------------------


def fuzz_triangles(spark, trials: int = 24) -> int:
    from hadoop_web_browsing_logs_spark.operators.graph import triangle_participation

    fails = 0
    for t in range(trials):
        rng = random.Random(5400 + t)
        el = _rand_undirected(rng)
        if not el:
            continue

        # independent reference: per-node neighbor-set intersections
        adj = defaultdict(set)
        for a, b in el:
            adj[a].add(b)
            adj[b].add(a)
        tri = defaultdict(int)
        for a, b in el:
            for c in adj[a] & adj[b]:
                tri[a] += 1  # each (a,b,c) triangle counted once per edge
        # each triangle has 3 edges; the loop above credits endpoint a of
        # every edge once per closing vertex -> node participation =
        # (sum over its incident triangle-edge-closings) / 2
        part = defaultdict(int)
        for a, b in el:
            for c in adj[a] & adj[b]:
                part[a] += 1
                part[b] += 1
        expected = {v: c // 2 for v, c in part.items() if c}

        df = spark.createDataFrame(el, ["a", "b"])
        got = {
            r["node"]: r["n_triangles"] for r in triangle_participation(df).collect()
        }
        if got != expected:
            fails += 1
            diffs = {
                v: (got.get(v), expected.get(v))
                for v in set(got) | set(expected)
                if got.get(v) != expected.get(v)
            }
            print(f"  triangles trial {t} FAIL: {dict(list(diffs.items())[:5])}")
    print(f"fuzz_triangles: {trials - fails}/{trials} ok")
    return fails


# ---------------------------------------------------------------------------
# events moment kernels left unfuzzed by round 13: attribution (time-band
# argmax), correlation (five dsum moments -> one double expression), trend
# (integer hour moments + dsum'd y moments). Each vs an independent Python
# recount with the declared dsum/HALF_UP/try_divide rules.
# ---------------------------------------------------------------------------


def _write_events14(rows) -> str:
    """rows: (event_id, ts_datetime|None, user_id|None, event_type, value)."""
    import tempfile

    import duckdb

    d = tempfile.mkdtemp(prefix="fuzz14_events_")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany("INSERT INTO e VALUES (?,?,?,?,?,?)", [r + (None,) for r in rows])
    con.execute(f"COPY e TO '{d}/events.parquet' (FORMAT PARQUET)")
    con.close()
    return d


def _q(x: float, digits: int) -> int | None:
    """dsum contribution: ROUND_HALF_UP of x*10^digits as int; None for
    non-finite (TRY_CAST skip)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    if x is None or not math.isfinite(x):
        return None
    return int(Decimal(x * 10**digits).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _dsum(vals, digits: int) -> float | None:
    cs = [c for c in (_q(v, digits) for v in vals) if c is not None]
    if not cs:
        return None
    return sum(cs) / float(10**digits)


def fuzz_attribution(spark, trials: int = 24) -> int:
    """q_events_attribution vs a per-purchase Python scan. Axes: view ties
    at one ts (argmax -> highest view_id), views exactly AT p.ts and AT
    p.ts - 1h (both inclusive), null-user and null-ts purchases (kept,
    unmatched), null-ts views (never match), duplicate purchases."""
    from datetime import datetime, timedelta

    from hadoop_web_browsing_logs_spark.plans.registry import get_query

    BASE = datetime(2024, 1, 1)
    q = get_query("q_events_attribution").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(10400 + t)
        rows = []
        eid = 0
        for _ in range(rng.randint(5, 120)):
            u = rng.choice([None] + list(range(1, 9)))
            ts = BASE + timedelta(minutes=rng.randint(0, 600))
            if rng.random() < 0.05:
                ts = None
            et = rng.choice(["view", "view", "purchase", "click"])
            rows.append((eid, ts, u, et, round(rng.uniform(0, 50), 2)))
            eid += 1
        # planted: two views at ONE ts (tie), views exactly at p.ts and at
        # p.ts - 1h, a purchase with zero views
        p_ts = BASE + timedelta(hours=20)
        rows += [
            (eid, p_ts, 50, "purchase", 9.0),
            (eid + 1, p_ts, 50, "view", 1.0),                      # at p.ts
            (eid + 2, p_ts - timedelta(hours=1), 50, "view", 1.0), # at -1h
            (eid + 3, p_ts - timedelta(minutes=30), 50, "view", 1.0),
            (eid + 4, p_ts - timedelta(minutes=30), 50, "view", 1.0),  # tie
            (eid + 5, p_ts, 51, "purchase", 3.0),                  # no views
        ]
        eid += 6
        d = _write_events14(rows)
        got = sorted(
            (r.purchase_id, r.user_id, r.purchase_ts, r.value,
             r.attributed_view_ts, r.attributed_view_id, r.n_candidate_views)
            for r in q(spark, d).collect()
        )
        views = [(u, ts, i) for (i, ts, u, et, _v) in rows
                 if et == "view" and ts is not None and u is not None]
        want = []
        for (i, ts, u, et, v) in rows:
            if et != "purchase":
                continue
            cand = [] if (ts is None or u is None) else [
                (vts, vi) for (vu, vts, vi) in views
                if vu == u and vts <= ts and vts >= ts - timedelta(hours=1)
            ]
            best = max(cand) if cand else (None, None)
            want.append((i, u, ts, v, best[0], best[1], len(cand)))
        want.sort(key=lambda r: (r[0],))
        got.sort(key=lambda r: (r[0],))
        if got != want:
            fails += 1
            diffs = [(a, b) for a, b in zip(got, want) if a != b]
            print(f"  attribution trial {t} MISMATCH {diffs[:3]}")
    print(f"fuzz_attribution: {trials - fails}/{trials} ok")
    return fails


def fuzz_corr(spark, trials: int = 24) -> int:
    """q_events_correlation vs a Python five-moment recount (dsum(2) hourly,
    dsum(2)/dsum(4) moments, GREATEST clamp, try_divide NULL). Axes:
    zero-variance (constant) series -> NULL corr, perfectly correlated and
    anti-correlated pairs, single-shared-hour pairs, NaN/Inf values
    (TRY_CAST-skipped), null-ts hours (join-excluded), all-non-finite
    hours (v NULL -> filtered)."""
    import math
    from datetime import datetime, timedelta

    from hadoop_web_browsing_logs_spark.plans.registry import get_query

    BASE = datetime(2024, 1, 1)
    q = get_query("q_events_correlation").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(11400 + t)
        hostile = t % 2 == 0
        rows = []
        eid = 0
        types = ["a", "b", "c", "d"][: rng.randint(2, 4)]
        for et in types:
            for h in range(rng.randint(2, 10)):
                if rng.random() < 0.2:
                    continue  # missing hour for this type
                for _ in range(rng.randint(1, 3)):
                    v = round(rng.uniform(-80, 80), 2)
                    if hostile and rng.random() < 0.06:
                        v = rng.choice([float("nan"), float("inf"), -float("inf")])
                    if et == "c":
                        v = 7.0  # constant series: zero variance -> NULL
                    if et == "d":
                        v = float(h)  # linear in hour: corr +/-1 vs others
                    ts = BASE + timedelta(hours=h, minutes=rng.randint(0, 59))
                    rows.append((eid, ts, 1, et, v))
                    eid += 1
        if hostile:
            rows.append((eid, None, 1, types[0], 5.0))  # null ts hour
            eid += 1
        d = _write_events14(rows)
        got = sorted(
            (r.type_a, r.type_b, r.n_hours,
             None if r.corr is None else round(r.corr, 10))
            for r in q(spark, d).collect()
        )
        # reference
        hourly: dict = {}
        for (_i, ts, _u, et, v) in rows:
            h = ts.replace(minute=0, second=0, microsecond=0) if ts is not None else None
            hourly.setdefault((et, h), []).append(v)
        hv = {
            k: _dsum(vs, 2) for k, vs in hourly.items()
        }
        hv = {k: v for k, v in hv.items() if v is not None and k[1] is not None}
        want = []
        for ta in types:
            for tb in types:
                if not ta < tb:
                    continue
                shared = sorted(
                    h for (et, h) in hv if et == ta and (tb, h) in hv
                )
                if not shared:
                    continue
                xs = [hv[(ta, h)] for h in shared]
                ys = [hv[(tb, h)] for h in shared]
                n = float(len(shared))
                sx, sy = _dsum(xs, 2), _dsum(ys, 2)
                sxy = _dsum([x * y for x, y in zip(xs, ys)], 4)
                sx2 = _dsum([x * x for x in xs], 4)
                sy2 = _dsum([y * y for y in ys], 4)
                den = math.sqrt(max(n * sx2 - sx * sx, 0.0)) * math.sqrt(
                    max(n * sy2 - sy * sy, 0.0)
                )
                corr = None if den == 0.0 else (n * sxy - sx * sy) / den
                want.append((ta, tb, len(shared),
                             None if corr is None else round(corr, 10)))
        want.sort()
        if got != want:
            fails += 1
            diffs = [(a, b) for a, b in zip(got, want) if a != b]
            print(f"  corr trial {t} MISMATCH {diffs[:3]} "
                  f"len={len(got)}/{len(want)}")
    print(f"fuzz_corr: {trials - fails}/{trials} ok")
    return fails


def fuzz_trend(spark, trials: int = 24) -> int:
    """q_events_trend vs a Python least-squares recount on exact integer
    hour moments + dsum'd y moments, same double-expression order. Axes:
    single-hour types (excluded by n > 1), two-hour minimal fits, null ts,
    NaN/Inf values, negative values, types whose every hour is non-finite."""
    from datetime import datetime, timedelta

    from hadoop_web_browsing_logs_spark.plans.registry import get_query

    BASE = datetime(2024, 1, 1)
    q = get_query("q_events_trend").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(12400 + t)
        hostile = t % 2 == 0
        rows = []
        eid = 0
        types = ["t1", "t2", "t3", "t4"][: rng.randint(2, 4)]
        for k, et in enumerate(types):
            n_hours = 1 if k == 1 else rng.randint(1, 12)  # t2: single hour
            for h in range(n_hours):
                for _ in range(rng.randint(1, 3)):
                    v = round(rng.uniform(-90, 90), 2)
                    if hostile and rng.random() < 0.06:
                        v = rng.choice([float("nan"), float("inf")])
                    ts = BASE + timedelta(hours=h, minutes=rng.randint(0, 59))
                    if hostile and rng.random() < 0.04:
                        ts = None
                    rows.append((eid, ts, 1, et, v))
                    eid += 1
        d = _write_events14(rows)
        got = sorted(
            (r.event_type, r.n_hours, round(r.slope_per_hour, 9),
             round(r.intercept, 6))
            for r in q(spark, d).collect()
        )
        hourly: dict = {}
        for (_i, ts, _u, et, v) in rows:
            if ts is None:
                continue
            hx = int(ts.timestamp()) // 3600
            hourly.setdefault((et, hx), []).append(v)
        hv = {k: _dsum(vs, 2) for k, vs in hourly.items()}
        hv = {k: v for k, v in hv.items() if v is not None}
        want = []
        for et in types:
            pts = sorted((hx, v) for (e2, hx), v in hv.items() if e2 == et)
            if len(pts) <= 1:
                continue
            n = float(len(pts))
            sx = float(sum(hx for hx, _ in pts))
            sy = _dsum([v for _, v in pts], 2)
            sx2 = float(sum(hx * hx for hx, _ in pts))
            sxy = _dsum([hx * v for hx, v in pts], 2)
            slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
            intercept = (sy - slope * sx) / n
            want.append((et, len(pts), round(slope, 9), round(intercept, 6)))
        want.sort()
        if got != want:
            fails += 1
            diffs = [(a, b) for a, b in zip(got, want) if a != b]
            print(f"  trend trial {t} MISMATCH {diffs[:3]}")
    print(f"fuzz_trend: {trials - fails}/{trials} ok")
    return fails


def fuzz_chisq(spark, trials: int = 24) -> int:
    """q_events_chisq vs a Python contingency recount. Axes: NEGATIVE
    user_ids (Spark/DuckDB % truncates toward zero; Python's %% floors —
    the reference must use int-truncation), single-cohort and single-type
    tables (dof 0), null user/type exclusions, sparse cells."""
    from datetime import datetime, timedelta

    from hadoop_web_browsing_logs_spark.plans.registry import get_query

    BASE = datetime(2024, 1, 1)
    q = get_query("q_events_chisq").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(13400 + t)
        shape = rng.choice(["normal", "one_cohort", "one_type", "negative"])
        rows = []
        eid = 0
        for _ in range(rng.randint(10, 200)):
            u = rng.randint(1, 50)
            if shape == "one_cohort":
                u = 10 * rng.randint(1, 5)  # every user_id % 10 == 0
            if shape == "negative" and rng.random() < 0.5:
                u = -u
            et = rng.choice(["a", "b", "c"]) if shape != "one_type" else "a"
            if rng.random() < 0.05:
                u = None
            if rng.random() < 0.05:
                et = None
            rows.append((eid, BASE + timedelta(minutes=eid), u, et, 1.0))
            eid += 1
        d = _write_events14(rows)
        got = [(r.n, r.dof, None if r.chi2 is None else round(r.chi2, 9))
               for r in q(spark, d).collect()]

        cells: dict = {}
        for (_i, _ts, u, et, _v) in rows:
            if u is None or et is None:
                continue
            # Spark/DuckDB % truncates toward zero (-23 % 10 = -3); Python's
            # % floors (-23 % 10 = 7) — mirror the engines, not Python
            cohort = u - int(u / 10) * 10
            cells[(cohort, et)] = cells.get((cohort, et), 0) + 1
        n = sum(cells.values())
        rt: dict = {}
        ct: dict = {}
        for (c, e2), o in cells.items():
            rt[c] = rt.get(c, 0) + o
            ct[e2] = ct.get(e2, 0) + o
        contribs = []
        for (c, e2), o in cells.items():
            exp = (float(rt[c]) * float(ct[e2])) / float(n)
            contribs.append(((float(o) - exp) * (float(o) - exp)) / exp)
        chi2 = _dsum(contribs, 6)
        want = [(n, (len(rt) - 1) * (len(ct) - 1),
                 None if chi2 is None else round(chi2, 9))]
        if not cells:
            want = got  # empty table: trust whatever both sides agree on
        if got != want:
            fails += 1
            print(f"  chisq trial {t} ({shape}) MISMATCH got={got} want={want}")
    print(f"fuzz_chisq: {trials - fails}/{trials} ok")
    return fails


def fuzz_spans(spark, trials: int = 24) -> int:
    """q_llm_contamination_span vs a Python positioned-shingle scan (bench =
    doc_id %% 97 == 0, 1-based positions, gaps-and-islands longest run).
    Axes: exact duplicates of a bench doc (wholesale copy: span = all
    positions), hits at position 1 and at the last position, intra-doc
    repeated shingles hitting at multiple positions, docs under 5 tokens
    (no shingles), corpora with NO bench doc (empty result), adjacent
    runs separated by exactly one gap."""
    from hadoop_web_browsing_logs_spark.plans.registry import get_query

    q = get_query("q_llm_contamination_span").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(14400 + t)
        vocab = [f"w{j}" for j in range(12)]
        bench_text = " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 30)))
        rows = []
        has_bench = rng.random() < 0.85
        if has_bench:
            rows.append((0, bench_text, "en", "s"))  # 0 % 97 == 0 -> bench
        ids = iter(i for i in range(1, 400) if i % 97 != 0)
        for _ in range(rng.randint(3, 25)):
            i = next(ids)
            r = rng.random()
            if r < 0.2 and has_bench:
                rows.append((i, bench_text, "en", "s"))  # wholesale copy
            elif r < 0.5 and has_bench:
                bt = bench_text.split()
                a = rng.randint(0, max(0, len(bt) - 5))
                b = rng.randint(a + 5, len(bt))
                quote = " ".join(bt[a:b])
                filler1 = " ".join(rng.choice(["x1", "x2", "x3"]) for _ in range(rng.randint(0, 8)))
                filler2 = " ".join(rng.choice(["y1", "y2"]) for _ in range(rng.randint(0, 8)))
                rows.append((i, f"{filler1} {quote} {filler2}".strip(), "en", "s"))
            else:
                rows.append((i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 20))), "en", "s"))
        d = _write_documents14(rows)
        got = sorted(
            (r.doc_id, r.n_hit_positions, r.max_span_shingles, r.max_span_tokens)
            for r in q(spark, d).collect()
        )

        def toks(s):
            return [w for w in s.lower().strip().split() if w]

        def sh5(ts):
            return [" ".join(ts[i:i + 5]) for i in range(len(ts) - 4)]

        bench_sh = set()
        for (i, text, _l, _s) in rows:
            if i % 97 == 0:
                bench_sh |= set(sh5(toks(text)))
        want = []
        for (i, text, _l, _s) in rows:
            if i % 97 == 0:
                continue
            hits = [p for p, s in enumerate(sh5(toks(text)), start=1) if s in bench_sh]
            if not hits:
                continue
            runs, cur = [], 1
            for a, b in zip(hits, hits[1:]):
                if b == a + 1:
                    cur += 1
                else:
                    runs.append(cur)
                    cur = 1
            runs.append(cur)
            want.append((i, len(hits), max(runs), max(runs) + 4))
        want.sort()
        if got != want:
            fails += 1
            diffs = [(a, b) for a, b in zip(got, want) if a != b]
            print(f"  spans trial {t} MISMATCH {diffs[:3]} len={len(got)}/{len(want)}")
    print(f"fuzz_spans: {trials - fails}/{trials} ok")
    return fails


def fuzz_colloc(spark, trials: int = 24) -> int:
    """q_text_collocations vs a Python bigram/unigram Counter recount with
    the exact PMI expression order and ROUND_HALF_UP at 6 dp. Axes: bigrams
    at exactly the min-count boundary (20 kept, 19 dropped), overlapping
    self-bigram runs ('a a a' -> (a,a) twice), single-token and empty docs,
    negative-PMI pairs (frequent unigrams, rare-ish pair)."""
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from hadoop_web_browsing_logs_spark.plans.registry import get_query

    q = get_query("q_text_collocations").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(15400 + t)
        rows = []
        did = 0
        # phrase pools engineered around the >=20 boundary
        reps_a = rng.choice([19, 20, 21])  # 'p q' appears exactly this often
        for _ in range(reps_a):
            rows.append((did, "p q", "en", "s"))
            did += 1
        for _ in range(rng.randint(20, 30)):  # self-run doc: overlapping (r,r)
            rows.append((did, "r r r", "en", "s"))
            did += 1
        for _ in range(rng.randint(5, 40)):  # noise, single-token, empty
            k = rng.randint(0, 6)
            rows.append((did, " ".join(rng.choice(["p", "q", "r", "s", "u"]) for _ in range(k)), "en", "s"))
            did += 1
        d = _write_documents14(rows)
        got = sorted(
            (r.tok_a, r.tok_b, r.n_ab, r.pmi) for r in q(spark, d).collect()
        )

        big: Counter = Counter()
        uni: Counter = Counter()
        for (_i, text, _l, _s) in rows:
            ts = [w for w in text.lower().strip().split() if w]
            uni.update(ts)
            big.update(zip(ts, ts[1:]))
        nb = float(sum(big.values()))
        want = []
        for (a, b), n_ab in big.items():
            if n_ab < 20:
                continue
            x = math.log(nb * n_ab / float(uni[a] * uni[b]))
            pmi = float(Decimal(x * 1e6).quantize(Decimal(1), rounding=ROUND_HALF_UP)) / 1e6
            want.append((a, b, n_ab, pmi))
        want.sort()
        if got != want:
            fails += 1
            diffs = [(x, y) for x, y in zip(got, want) if x != y]
            print(f"  colloc trial {t} MISMATCH {diffs[:3]} len={len(got)}/{len(want)}")
    print(f"fuzz_colloc: {trials - fails}/{trials} ok")
    return fails


def fuzz_domain_cap(spark, trials: int = 24) -> int:
    """q_llm_domain_cap vs a Python md5-order recount (hashlib md5 hex of
    the utf-8 text, NULL -> '', tie-break doc_id). Axes: a mega-domain
    several times the cap, NULL-text docs inside an over-cap source (the
    round-8 NULLS-FIRST/LAST latent bug class), duplicate texts (hex ties
    resolved by doc_id), NULL sources (their own partition), under-cap
    sources kept whole."""
    import hashlib

    from hadoop_web_browsing_logs_spark.operators.llm_pipeline import DOMAIN_CAP
    from hadoop_web_browsing_logs_spark.plans.registry import get_query

    q = get_query("q_llm_domain_cap").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(16400 + t)
        rows = []
        did = 0
        for src in ["mega", "small", None, "dupes"]:
            n = rng.randint(DOMAIN_CAP * 2, DOMAIN_CAP * 4) if src == "mega" else rng.randint(1, DOMAIN_CAP)
            if src == "dupes":
                n = DOMAIN_CAP + rng.randint(5, 20)
            for _ in range(n):
                if src == "dupes":
                    text = rng.choice(["same text", "same text", "other"])
                else:
                    text = " ".join(f"t{rng.randint(0, 50)}" for _ in range(rng.randint(0, 8)))
                if rng.random() < 0.1:
                    text = None
                rows.append((did, text, "en", src))
                did += 1
        d = _write_documents14(rows)
        got = [(r.source, r.doc_id) for r in q(spark, d).collect()]

        per: dict = {}
        for (i, text, _l, src) in rows:
            h = hashlib.md5((text or "").encode("utf-8")).hexdigest()
            per.setdefault(src, []).append((h, i))
        want = []
        for src, lst in per.items():
            for _h, i in sorted(lst)[:DOMAIN_CAP]:
                want.append((src, i))
        want.sort(key=lambda r: (r[0] is None, r[0] or "", r[1]))
        got.sort(key=lambda r: (r[0] is None, r[0] or "", r[1]))
        if got != want:
            fails += 1
            diffs = [(a, b) for a, b in zip(got, want) if a != b]
            print(f"  domain_cap trial {t} MISMATCH {diffs[:4]} "
                  f"len={len(got)}/{len(want)}")
    print(f"fuzz_domain_cap: {trials - fails}/{trials} ok")
    return fails


def fuzz_jaccard_prefix(spark, trials: int = 24) -> int:
    """jaccard_prefix_pairs (registered round 14) vs a brute-force Python
    all-pairs Jaccard — a randomized check of the prefix-filter theorem on
    shapes the fixture lacks. Axes: token-set sizes at EXACT multiples of
    1/(1-tau) (the integer-ceil boundary a float prefix length gets wrong),
    near-identical docs differing in one token, exact duplicates,
    boilerplate-heavy corpora (hot prefix tokens), single-token docs,
    varying tau including 2/3 (a non-terminating binary fraction)."""
    from hadoop_web_browsing_logs_spark.operators.dedup import jaccard_prefix_pairs

    fails = 0
    for t in range(trials):
        rng = random.Random(18400 + t)
        tau = rng.choice([0.9, 0.8, 2 / 3, 0.5])
        vocab = [f"w{j}" for j in range(30)]
        rows = []
        did = 0
        base_pool = []
        for _ in range(rng.randint(5, 40)):
            r = rng.random()
            if r < 0.25 and base_pool:
                toks = list(rng.choice(base_pool))
                if rng.random() < 0.6 and toks:  # one-token edit
                    toks[rng.randrange(len(toks))] = rng.choice(vocab)
            else:
                # sizes hammered onto ceil boundaries: 10/20/30 at tau=0.9 etc.
                n = rng.choice([1, 2, 3, 9, 10, 11, 20, 30, rng.randint(1, 25)])
                toks = [rng.choice(vocab) for _ in range(n)]
            base_pool.append(toks)
            rows.append((did, " ".join(toks), "en", "s"))
            did += 1
        d = _write_documents14(rows)
        from hadoop_web_browsing_logs_spark.sources.readers import load_table

        docs = load_table(spark, d, "documents")
        got = sorted(
            (r.doc_a, r.doc_b, round(r.jaccard, 10))
            for r in jaccard_prefix_pairs(docs, tau).collect()
        )
        sets = {}
        for (i, text, _l, _s) in rows:
            s = set(w for w in text.lower().strip().split() if w)
            if s:
                sets[i] = s
        want = []
        for a in sets:
            for b in sets:
                if a < b:
                    inter = len(sets[a] & sets[b])
                    jac = inter / (len(sets[a]) + len(sets[b]) - inter)
                    if jac >= tau:
                        want.append((a, b, round(jac, 10)))
        want.sort()
        if got != want:
            fails += 1
            only_g = [r for r in got if r not in want][:3]
            only_w = [r for r in want if r not in got][:3]
            print(f"  jaccard_prefix trial {t} (tau={tau}) MISMATCH "
                  f"extra={only_g} missing={only_w}")
    print(f"fuzz_jaccard_prefix: {trials - fails}/{trials} ok")
    return fails


def fuzz_expectations(spark, trials: int = 24) -> int:
    """q_quality_expectations vs a Python recount of all five checks.
    Axes: values exactly AT the range bounds (quantity 1/50, discount
    0/0.9 — kept; just outside — violations), NULL quantities/discounts
    (excluded from the conditional count on both engines), duplicate
    o_orderkey rows (uniqueness violations AND FK left-join FANOUT — the
    FK check's n_checked grows past len(lineitem)), NULL l_orderkey rows
    (unmatched -> FK violations), orphaned lineitems."""
    import tempfile

    import duckdb

    from hadoop_web_browsing_logs_spark.plans.registry import get_query

    q = get_query("q_quality_expectations").fn
    fails = 0
    for t in range(trials):
        rng = random.Random(17400 + t)
        okeys = []
        for i in range(rng.randint(3, 30)):
            okeys.append(i)
            if rng.random() < 0.25:
                okeys.append(i)  # duplicate order key: uniq violation + fanout
        li = []
        for _ in range(rng.randint(5, 120)):
            lk = rng.choice([rng.choice(okeys), 9999, None])  # orphan / null fk
            qty = rng.choice([0, 1, 25, 50, 51, None])
            disc = rng.choice([-0.1, 0.0, 0.45, 0.9, 0.91, None])
            ship = rng.choice(["2024-01-05", None])
            li.append((lk, qty, disc, ship))

        d = tempfile.mkdtemp(prefix="fuzz14_qe_")
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE li (l_orderkey BIGINT, l_quantity DOUBLE,"
            " l_discount DOUBLE, l_shipdate DATE)"
        )
        con.executemany("INSERT INTO li VALUES (?,?,?,?)", li)
        con.execute(f"COPY li TO '{d}/lineitem.parquet' (FORMAT PARQUET)")
        con.execute("CREATE TABLE o (o_orderkey BIGINT)")
        con.executemany("INSERT INTO o VALUES (?)", [(k,) for k in okeys])
        con.execute(f"COPY o TO '{d}/orders.parquet' (FORMAT PARQUET)")
        con.close()

        got = {r.check_name: (r.n_checked, r.n_violations)
               for r in q(spark, d).collect()}

        n_li = len(li)
        want = {
            "lineitem_quantity_in_range": (
                n_li,
                sum(1 for (_k, qt, _d, _s) in li
                    if qt is not None and (qt < 1 or qt > 50)),
            ),
            "lineitem_discount_in_range": (
                n_li,
                sum(1 for (_k, _q, dc, _s) in li
                    if dc is not None and (dc < 0 or dc > 0.9)),
            ),
            "lineitem_shipdate_not_null": (
                n_li,
                sum(1 for (_k, _q, _d, s) in li if s is None),
            ),
            "orders_orderkey_unique": (len(okeys), len(okeys) - len(set(okeys))),
        }
        from collections import Counter

        oc = Counter(okeys)
        fk_checked = sum(max(oc.get(k, 0), 1) if k is not None else 1
                         for (k, _q, _d, _s) in li)
        fk_viol = sum(1 for (k, _q, _d, _s) in li
                      if k is None or oc.get(k, 0) == 0)
        want["lineitem_orderkey_fk"] = (fk_checked, fk_viol)
        if got != want:
            fails += 1
            diffs = {k: (got.get(k), want.get(k))
                     for k in set(got) | set(want) if got.get(k) != want.get(k)}
            print(f"  expectations trial {t} MISMATCH {diffs}")
    print(f"fuzz_expectations: {trials - fails}/{trials} ok")
    return fails


def _write_documents14(rows) -> str:
    """rows: (doc_id, text|None, lang, source)."""
    import tempfile

    import duckdb

    d = tempfile.mkdtemp(prefix="fuzz14_docs_")
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
    con.close()
    return d


# ---------------------------------------------------------------------------
# lloyd: lloyd_kmeans vs an independent Python recount. The registered
# q_vec_kmeans_lloyd oracle UNROLLS the identical recurrence as a CTE chain
# — the same shared-derivation class as the graph oracles. The reference
# mirrors only the DECLARED mechanisms (dsum(6) fixed point, left-to-right
# in-order L2 fold, (dist, center_id) struct-min tie-break, per-dimension
# carry-forward) from the docstrings, not the DataFrame plan.
# ---------------------------------------------------------------------------


def fuzz_lloyd(spark, trials: int = 24) -> int:
    from decimal import ROUND_HALF_UP, Decimal

    from hadoop_web_browsing_logs_spark.operators.vectors import lloyd_kmeans

    def q6(x: float) -> int:
        return int(Decimal(x * 1e6).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    fails = 0
    for t in range(trials):
        rng = random.Random(9400 + t)
        dim = rng.randint(2, 6)
        n = rng.randint(6, 40)
        k = rng.randint(2, min(5, n))
        iters = rng.randint(1, 3)
        vecs = {
            i: [round(rng.uniform(-5, 5), 3) for _ in range(dim)] for i in range(n)
        }
        if rng.random() < 0.6 and n > k:
            # exact-tie axis: a non-seed duplicate of seed 0 — equidistant
            # rows must break ties to the SMALLEST center_id
            vecs[k] = list(vecs[0])
        if rng.random() < 0.6:
            # empty-cluster axis: seeds 0 and 1 identical — every row ties
            # them and goes to center 0, so center 1 carries forward with 0
            vecs[1] = list(vecs[0])

        # independent reference
        seed_ids = sorted(vecs)[:k]
        centers = {ci: list(vecs[vid]) for ci, vid in enumerate(seed_ids)}
        n_members = {ci: 0 for ci in centers}
        for _ in range(iters):
            assign = {}
            for vid, e in vecs.items():
                best = min(
                    (sum((e[j] - c[j]) ** 2 for j in range(dim)), ci)
                    for ci, c in centers.items()
                )
                assign[vid] = best[1]
            new_centers = {}
            for ci in centers:
                members = [vecs[v] for v, a in assign.items() if a == ci]
                n_members[ci] = len(members)
                if members:
                    new_centers[ci] = [
                        (sum(q6(e[j]) for e in members) / 1e6) / len(members)
                        for j in range(dim)
                    ]
                else:
                    new_centers[ci] = centers[ci]  # carry forward
            centers = new_centers
        expected = sorted(
            (ci, tuple(c), n_members[ci]) for ci, c in centers.items()
        )

        df = spark.createDataFrame(
            [(i, v) for i, v in sorted(vecs.items())], ["vec_id", "embedding"]
        )
        got = sorted(
            (r["center_id"], tuple(r["c"]), r["n_members"])
            for r in lloyd_kmeans(df, k, iterations=iters).collect()
        )
        if got != expected:
            fails += 1
            diffs = [(g, e) for g, e in zip(got, expected) if g != e]
            print(f"  lloyd trial {t} (k={k}, K={iters}, d={dim}) FAIL: "
                  f"{diffs[:2]}")
    print(f"fuzz_lloyd: {trials - fails}/{trials} ok")
    return fails


# ---------------------------------------------------------------------------
# streaming equivalence fuzz (VERDICT r13 item 3): randomized hostile event
# TAPES — multiple parquet files, one file per micro-batch under
# maxFilesPerTrigger=1 — replayed through readStream and compared against the
# batch twin, exactly the claim the five registered equiv gates make on the
# fixed fixture. Hostile axes the fixture never exercises: late data exactly
# AT the watermark, sessions merging across >=3 micro-batches, a user whose
# entire history is one micro-batch, same-ts state-change ties, unmatched
# purchases flushing only via the far-future sentinel.
# ---------------------------------------------------------------------------

BASE_TS = 1704067200  # 2024-01-01 00:00:00 UTC, epoch seconds


def _write_event_tape(batches) -> str:
    """batches: list of row lists; each inner list becomes ONE parquet file
    (= one micro-batch). Rows: (event_id, ts_epoch_s|None, user_id|None,
    event_type, value). Returns an sf_dir-shaped tmp root whose
    events.parquet is a DIRECTORY of sequentially-named, mtime-ordered
    files — the layout both load_table and the file stream source accept."""
    import os
    import tempfile
    import time as _time

    import duckdb

    root = tempfile.mkdtemp(prefix="fuzz14_stream_")
    d = os.path.join(root, "events.parquet")
    os.mkdir(d)
    t0 = _time.time() - 1000
    for i, rows in enumerate(batches):
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE e (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
            " event_type VARCHAR, value DOUBLE, props VARCHAR)"
        )
        con.executemany(
            "INSERT INTO e VALUES (?, to_timestamp(?), ?, ?, ?, ?)",
            [(r[0], r[1], r[2], r[3], r[4], None) for r in rows],
        )
        p = os.path.join(d, f"part-{i:03d}.parquet")
        con.execute(f"COPY e TO '{p}' (FORMAT PARQUET)")
        con.close()
        os.utime(p, (t0 + i, t0 + i))  # file source orders by (mtime, path)
    return root


def _rows_set(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _split_tape(rng: random.Random, rows, n_batches: int):
    """Split ts-sorted rows into sequential micro-batches at ts boundaries
    (equal-ts rows never straddle a batch — the SCD2 cross-batch-order
    contract), then inject bounded lateness: move a few rows one batch LATER
    while keeping them within the 2h watermark allowance of that batch's
    maximum — including some exactly AT the boundary."""
    rows = sorted(rows, key=lambda r: (r[1], r[0]))
    cuts = sorted(rng.sample(range(1, len(rows)), min(n_batches - 1, len(rows) - 1)))
    batches = []
    prev = 0
    for c in cuts + [len(rows)]:
        # slide the cut right so equal-ts runs stay together
        while c < len(rows) and c > prev and rows[c][1] == rows[c - 1][1]:
            c += 1
        if c > prev:
            batches.append(rows[prev:c])
            prev = c
    return [b for b in batches if b]


def fuzz_stream_win(spark, trials: int = 24) -> int:
    """Tumbling (2h watermark) + session (30min gap, 1h watermark) streamed
    in complete mode vs the batch builders — the q_stream_equiv_gate /
    q_stream_session_equiv_gate claim on hostile random tapes."""
    from pyspark.sql import functions as F

    from hadoop_web_browsing_logs_spark.sources.readers import load_table
    from hadoop_web_browsing_logs_spark.streaming.windows import (
        _replay_events_stream,
        session_agg,
        tumbling_agg,
    )

    fails = 0
    for t in range(trials):
        rng = random.Random(6400 + t)
        rows = []
        eid = 0
        # several users; sessions engineered to span >=3 micro-batches via
        # 20-25 min hops (inside the 30 min gap); occasional exact-gap hops
        for u in range(1, rng.randint(3, 7)):
            ts = BASE_TS + rng.randint(0, 3600)
            for _ in range(rng.randint(1, 12)):
                rows.append((eid, ts, u, rng.choice(["view", "click", "purchase"]),
                             round(rng.uniform(-50, 50), 2)))
                eid += 1
                hop = rng.choice([60, 300, 1200, 1500, 1800, 1800, 2700, 7200])
                ts += hop  # 1800 = exactly the 30-min gap boundary
        if rng.random() < 0.5:
            rows.append((eid, None, 1, "view", 1.0))  # null ts: excluded
            eid += 1
        if rng.random() < 0.5:
            rows.append((eid, BASE_TS + 100, None, "view", 2.0))  # null user
            eid += 1
        batches = _split_tape(rng, [r for r in rows if r[1] is not None],
                              rng.randint(3, 6))
        # late-at-the-watermark probe: duplicate-shift one event into the
        # NEXT batch with ts exactly (that batch's max - watermark)
        if len(batches) >= 2 and rng.random() < 0.7:
            wm = 7200  # tumbling watermark
            mx = max(r[1] for r in batches[-1])
            batches[-1].append((eid, mx - wm, 99, "view", 3.0))
            eid += 1
        nulls = [r for r in rows if r[1] is None]
        if nulls:
            batches[0] = nulls + batches[0]
        d = _write_event_tape(batches)

        ev = load_table(spark, d, "events")
        for which, build, keys, vals in (
            ("tumbling", tumbling_agg, ["window_start", "event_type"],
             ["n_events", "sum_value"]),
            ("session", session_agg, ["session_start", "user_id"],
             ["session_end", "n_events"]),
        ):
            batch = build(ev.filter(F.col("ts").isNotNull()))
            streamed = _replay_events_stream(
                spark, d, build, f"fz14_{which}_{t}"
            )
            b = _rows_set(batch, keys + vals)
            s = _rows_set(streamed, keys + vals)
            if b != s:
                fails += 1
                only_b = [r for r in b if r not in s][:3]
                only_s = [r for r in s if r not in b][:3]
                print(f"  stream_win trial {t} {which} MISMATCH "
                      f"batch-only={only_b} stream-only={only_s}")
    print(f"fuzz_stream_win: {2 * trials - fails}/{2 * trials} ok")
    return fails


def fuzz_stream_scd2(spark, trials: int = 24) -> int:
    """The applyInPandasWithState SCD2 state machine (append mode) vs the
    batch twin's closed intervals — q_stream_scd2_equiv_gate's claim on
    hostile tapes: same-ts state-change ties (event_id tie-break),
    single-batch whole histories, users spanning every batch, zero-length
    intervals from two changes at one timestamp."""
    from pyspark.sql import functions as F

    from hadoop_web_browsing_logs_spark.operators.events_analytics import (
        q_events_scd2,
    )
    from hadoop_web_browsing_logs_spark.streaming.windows import (
        _replay_events_stream,
        streaming_scd2,
    )

    fails = 0
    for t in range(trials):
        rng = random.Random(7400 + t)
        rows = []
        eid = 0
        for u in range(1, rng.randint(3, 8)):
            ts = BASE_TS + rng.randint(0, 600)
            burst = rng.random() < 0.3  # whole history inside one second run
            for _ in range(rng.randint(1, 14)):
                rows.append((eid, ts, u,
                             rng.choice(["view", "click", "purchase", "view"]),
                             1.0))
                eid += 1
                if burst:
                    ts += rng.choice([0, 0, 1])  # same-ts ties: event_id order
                else:
                    ts += rng.randint(0, 4000)
        batches = _split_tape(rng, rows, rng.randint(3, 6))
        d = _write_event_tape(batches)

        batch = q_events_scd2(spark, d).filter(F.col("valid_to").isNotNull())
        streamed = _replay_events_stream(
            spark, d,
            lambda s: streaming_scd2(
                s.filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
            ),
            f"fz14_scd2_{t}", mode="append",
        )
        cols = ["user_id", "valid_from", "state", "valid_to"]
        b, s = _rows_set(batch, cols), _rows_set(streamed, cols)
        if b != s:
            fails += 1
            only_b = [r for r in b if r not in s][:3]
            only_s = [r for r in s if r not in b][:3]
            print(f"  scd2 trial {t} MISMATCH batch-only={only_b} "
                  f"stream-only={only_s}")
    print(f"fuzz_stream_scd2: {trials - fails}/{trials} ok")
    return fails


def fuzz_stream_interval(spark, trials: int = 24) -> int:
    """Stream-stream interval joins, inner AND left-outer (the
    watermark-gated shape: unmatched purchases flush only after the
    sentinel advances the watermark) vs the batch twins — the
    q_stream_interval_/left_equiv_gate claims on hostile tapes: matches
    exactly AT the 1h interval bound, view exactly at the purchase ts,
    purchases with zero views, NULL-user purchases surviving as unmatched
    rows, tail-of-tape purchases whose flush IS the sentinel's job."""
    from pyspark.sql import functions as F

    from hadoop_web_browsing_logs_spark.sources.readers import load_table
    from hadoop_web_browsing_logs_spark.streaming.windows import (
        _replay_events_stream,
        interval_join_purchases_left,
        interval_join_views_purchases,
    )

    fails = 0
    for t in range(trials):
        rng = random.Random(8400 + t)
        rows = []
        eid = 0
        for u in range(1, rng.randint(3, 7)):
            ts = BASE_TS + rng.randint(0, 1200)
            for _ in range(rng.randint(1, 10)):
                et = rng.choice(["view", "purchase", "view", "click"])
                rows.append((eid, ts, u, et, round(rng.uniform(0, 99), 2)))
                eid += 1
                ts += rng.choice([0, 1, 600, 3599, 3600, 3601, 5000])
                # 3600 = exactly the 1h interval bound; 0 = view at purchase ts
        if rng.random() < 0.6:  # NULL-user purchase: unmatched on both sides
            rows.append((eid, BASE_TS + 500, None, "purchase", 7.0))
            eid += 1
        if rng.random() < 0.6:  # tail purchase: flushes only via sentinel
            mx = max(r[1] for r in rows)
            rows.append((eid, mx + 100, 1, "purchase", 8.0))
            eid += 1
        batches = _split_tape(rng, rows, rng.randint(3, 6))
        d = _write_event_tape(batches)

        ev = load_table(spark, d, "events").filter(F.col("ts").isNotNull())
        views = ev.filter(F.col("event_type") == "view")
        purchases = ev.filter(F.col("event_type") == "purchase")
        cols = ["purchase_id", "view_id", "p_user", "purchase_ts", "view_ts", "value"]

        # inner
        batch = interval_join_views_purchases(views, purchases)
        streamed = _replay_events_stream(
            spark, d,
            lambda s: interval_join_views_purchases(
                s.filter(F.col("event_type") == "view"),
                s.filter(F.col("event_type") == "purchase"),
            ),
            f"fz14_ivl_{t}", mode="append",
        )
        b, s = _rows_set(batch, cols), _rows_set(streamed, cols)
        if b != s:
            fails += 1
            print(f"  interval trial {t} inner MISMATCH "
                  f"batch-only={[r for r in b if r not in s][:3]} "
                  f"stream-only={[r for r in s if r not in b][:3]}")

        # left-outer with watermark sentinel
        batch = interval_join_purchases_left(purchases, views)
        streamed = _replay_events_stream(
            spark, d,
            lambda s: interval_join_purchases_left(
                s.filter((F.col("event_type") == "purchase") & F.col("ts").isNotNull()),
                s.filter((F.col("event_type") == "view") & F.col("ts").isNotNull()),
            ),
            f"fz14_ivll_{t}", mode="append", watermark_sentinel=True,
        ).filter(~F.col("p_user").eqNullSafe(-999))
        b, s = _rows_set(batch, cols), _rows_set(streamed, cols)
        if b != s:
            fails += 1
            print(f"  interval trial {t} LEFT MISMATCH "
                  f"batch-only={[r for r in b if r not in s][:3]} "
                  f"stream-only={[r for r in s if r not in b][:3]}")
    print(f"fuzz_stream_interval: {2 * trials - fails}/{2 * trials} ok")
    return fails


def main() -> None:
    # Defaults below are the RECORDED sweep depth (24 trials per family —
    # the SCALE.md round-14 ledger; ADVICE r14 item 1: the old 8/6
    # defaults only reproduced a 138-trial quick pass and the 432-trial
    # ledger run was reachable solely via the positional override).
    # `python docs/fuzz_round14.py all` now reproduces the ledger
    # (~30 min); pass a smaller override for a quick pass, e.g.
    # `python docs/fuzz_round14.py all 8`.
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    override = int(sys.argv[2]) if len(sys.argv) > 2 else None
    spark = get_spark("fuzz14")
    total = 0
    ran = []
    for name, fn, trials in (
        ("pagerank", fuzz_pagerank, 24),
        ("lpa", fuzz_lpa, 24),
        ("bfs", fuzz_bfs, 24),
        ("reach", fuzz_reach, 24),
        ("triangles", fuzz_triangles, 24),
        ("lloyd", fuzz_lloyd, 24),
        ("attribution", fuzz_attribution, 24),
        ("corr", fuzz_corr, 24),
        ("trend", fuzz_trend, 24),
        ("chisq", fuzz_chisq, 24),
        ("domain_cap", fuzz_domain_cap, 24),
        ("expectations", fuzz_expectations, 24),
        ("jaccard_prefix", fuzz_jaccard_prefix, 24),
        ("spans", fuzz_spans, 24),
        ("colloc", fuzz_colloc, 24),
        ("stream_win", fuzz_stream_win, 24),
        ("stream_scd2", fuzz_stream_scd2, 24),
        ("stream_interval", fuzz_stream_interval, 24),
    ):
        if which in (name, "all"):
            f = fn(spark, override or trials)
            ran.append((name, override or trials, f))
            total += f
    print(f"TOTAL failures: {total} across {ran}")
    sys.exit(1 if total else 0)


if __name__ == "__main__":
    main()
