"""Round-15 A/B: adjudicate the graph-family bench drift (VERDICT r14
item 2).

The r14 driver bench flagged exactly the graph family — q_graph_pagerank
1.28x, q_graph_pagerank_dangling 1.37x, q_graph_label_propagation 1.25x
(q_graph_bfs_frontier 1.26x sub-gate) — on code UNTOUCHED since round 12
(verified by git diff), while the uniform ambient discriminator read
1.018 (flag down). The discriminator's median over mostly sub-second
queries is blind to a duration-correlated load effect, so this settles it
with the established cross-code-state methodology (SCALE.md): a git
worktree at the r12 wrap commit (e7d6386), one PROCESS per sample,
alternating HEAD / r12 so ambient drift penalizes both arms equally,
machine idle (the post-suite 1.4x footgun applies), median of >= 5 per
arm.

Usage:
  git worktree add /tmp/r15_wt e7d6386
  python docs/ab_round15.py run <repo_path>   # one arm, one process,
                                              # prints one JSON line
  python docs/ab_round15.py orchestrate       # alternates 5x each arm,
                                              # prints medians table

Interpretation contract (VERDICT r14): parity => the drift was bench-time
load concentrating in the longest multi-stage iterative jobs — extend the
bench discriminator with a long-query tier and record the adjudication;
a real gap => bisect session conf / registry growth / cache pressure
between the two states.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import time

GRAPH_QUERIES = (
    "q_graph_pagerank",
    "q_graph_pagerank_dangling",
    "q_graph_label_propagation",
    "q_graph_bfs_frontier",
)
SF = "/root/testdata/sf0.1"
RUNS_PER_ARM = 5


def run_arm(repo_path: str) -> None:
    """One sample of the whole graph family under ONE fresh JVM, using the
    code at ``repo_path``. Warm-up pass first (JIT, parquet footers,
    checkpoint materialization), then one timed pass per query."""
    sys.path.insert(0, repo_path)
    from hadoop_web_browsing_logs_spark.plans.registry import get_query
    from hadoop_web_browsing_logs_spark.session import get_spark

    spark = get_spark("ab15-graph", cpus=32)
    fns = {name: get_query(name).fn for name in GRAPH_QUERIES}
    # bench.py discipline: full warm-up pass over ALL queries (JIT, parquet
    # footers, checkpointed static tables), then interleaved timed rounds
    for fn in fns.values():
        fn(spark, SF).write.format("noop").mode("overwrite").save()
    out: dict[str, list[float]] = {name: [] for name in GRAPH_QUERIES}
    for _ in range(3):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            out[name].append(round(time.perf_counter() - t0, 3))
    print("ABRESULT " + json.dumps({"repo": repo_path, "queries": out}))


def orchestrate() -> None:
    arms = {"HEAD": "/root/repo", "r12": "/tmp/r15_wt"}
    samples: dict[str, dict[str, list[float]]] = {
        a: {q: [] for q in GRAPH_QUERIES} for a in arms
    }
    for i in range(RUNS_PER_ARM):
        for arm, path in arms.items():
            p = subprocess.run(
                [sys.executable, __file__, "run", path],
                capture_output=True, text=True, cwd=path,
            )
            line = next(
                (ln for ln in p.stdout.splitlines() if ln.startswith("ABRESULT ")),
                None,
            )
            if line is None:
                print(f"arm {arm} run {i} FAILED:\n{p.stderr[-2000:]}")
                continue
            got = json.loads(line[len("ABRESULT "):])["queries"]
            for q, ss in got.items():
                samples[arm][q].extend(ss)
            print(f"run {i} {arm}: " + " ".join(f"{q.split('graph_')[1]}={ss}" for q, ss in got.items()))
    print("\nmedians (HEAD vs r12):")
    for q in GRAPH_QUERIES:
        h = statistics.median(samples["HEAD"][q])
        r = statistics.median(samples["r12"][q])
        print(f"  {q}: HEAD {h:.3f}s  r12 {r:.3f}s  ratio {h / r:.3f}x")


def _skew_corpus(spark):
    """VERDICT r14 item 3 fixture: a boilerplate-heavy corpus at sf0.1
    scale — 800 of 2,000 docs share a 40-token boilerplate block (so at
    low tau the prefix reaches into the SHARED tokens and a hot prefix
    token can fan out up to 800-choose-2 candidate rows), 1,100 unique,
    100 planted near-dup pairs (J = 0.95 and 0.9). Staged as tmp PARQUET
    (never localCheckpoint — the r14 A/B footgun)."""
    boiler = " ".join(f"legal{i} disclaimer{i}" for i in range(20))  # 40 tokens
    rows = []
    for i in range(800):
        uniq = " ".join(f"u{i}x{j}" for j in range(10))  # 50 tokens, J(boiler docs) = 40/60 = 0.667
        rows.append((i, f"{boiler} {uniq}"))
    for i in range(800, 1900):
        rows.append((i, " ".join(f"v{i}x{j}" for j in range(40))))
    for k in range(100):  # planted near-dups: 19/20 = 0.95 and 18/20 = 0.9
        core = [f"w{k}x{j}" for j in range(19)]
        rows.append((1900 + 2 * k, " ".join(core + [f"wa{k}"])))
        rows.append((1901 + 2 * k, " ".join(core + [f"wb{k}"])))
    import tempfile

    d = tempfile.mkdtemp(prefix="jacskew_") + "/docs.parquet"
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(4).write.parquet(d)
    return spark.read.parquet(d)


def jaccard_skew_run() -> None:
    import os
    import time as _t

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from hadoop_web_browsing_logs_spark.operators import dedup as D
    from hadoop_web_browsing_logs_spark.session import get_spark

    spark = get_spark("ab15-jacskew", cpus=32)
    docs = _skew_corpus(spark)

    def quad(tau):
        d = docs.select("doc_id", D.distinct_tokens().alias("toks")).filter(
            F.size("toks") > 0
        )
        a = d.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"))
        b = d.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"))
        inter = F.size(F.array_intersect("toks_a", "toks_b"))
        jac = inter.cast("double") / (F.size("toks_a") + F.size("toks_b") - inter)
        return (
            a.join(b, F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= tau)
        )

    for tau in (0.9, 0.8, 0.5):
        n_cand = D._jaccard_prefix_candidates(docs, tau)[1].count()
        # warm + 3 timed, interleaved
        D.jaccard_prefix_pairs(docs, tau).write.format("noop").mode("overwrite").save()
        quad(tau).write.format("noop").mode("overwrite").save()
        tp, tq = [], []
        for _ in range(3):
            t0 = _t.perf_counter()
            D.jaccard_prefix_pairs(docs, tau).write.format("noop").mode("overwrite").save()
            tp.append(_t.perf_counter() - t0)
            t0 = _t.perf_counter()
            quad(tau).write.format("noop").mode("overwrite").save()
            tq.append(_t.perf_counter() - t0)
        n_pairs = D.jaccard_prefix_pairs(docs, tau).count()
        n_quad = quad(tau).count()
        import statistics as st

        print(
            f"tau={tau}: candidates={n_cand} pairs={n_pairs} (quad twin {n_quad}) "
            f"prefix median {st.median(tp):.2f}s vs quad {st.median(tq):.2f}s"
        )


if __name__ == "__main__":
    if sys.argv[1] == "run":
        run_arm(sys.argv[2])
    elif sys.argv[1] == "jaccard_skew":
        jaccard_skew_run()
    else:
        orchestrate()
