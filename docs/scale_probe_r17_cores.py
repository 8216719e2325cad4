"""Round-17 sf1.0 core-scaling probe (VERDICT r16 item 5).

The r16 driver's 8-vs-32-core block read < 1 ratios for the iterative
graph family AT sf0.1 — per-iteration fixed cost (job scheduling, tiny
32-way shuffles, driver loops), not data parallelism, dominates there, so
the bench cannot see the kernels' parallel behavior at all. This probe
runs the iterative family (plus the heaviest non-iterative kernels as
controls) at sf1.0 (/tmp/sf1.0, docs/make_sf1.py — a controlled 10x
disjoint-universe upscale) at BOTH core counts, one fresh process per
(query, cpus) point so `local[n]` and `spark.sql.shuffle.partitions`
really differ.

Usage:
    python docs/scale_probe_r17_cores.py <cpus> <query> [...]   # one point
    python docs/scale_probe_r17_cores.py --all                  # orchestrate

Each point prints one JSON line {"query", "cpus", "sf", "sec", "rows"}.
--all runs every (query, cpus) pair in a fresh subprocess and prints the
final sec@8 / sec@32 table for SCALE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = "/tmp/sf1.0"

PROBE = [
    "q_graph_pagerank",
    "q_graph_pagerank_dangling",
    "q_graph_label_propagation",
    "q_graph_bfs_frontier",
    "q_dedup_components",
    # controls: heavy non-iterative kernels whose 8v32 ratio SHOULD track
    # cores if the iteratives' flat ratios are loop overhead, not a
    # machine artifact
    "q_vec_covariance",
    "q_dedup_jaccard_prefix_t7",
]


def run_point(cpus: int, name: str) -> None:
    from hadoop_web_browsing_logs_spark.plans.registry import get_query
    from hadoop_web_browsing_logs_spark.session import get_spark

    spark = get_spark(f"probe_{name}_{cpus}", cpus=cpus)
    q = get_query(name)
    # warm-up pass (JVM/JIT/parquet footers), then one timed noop pass —
    # sf1.0 queries run long enough that median-of-1 beats paying 3x wall
    q.fn(spark, SF1).write.format("noop").mode("overwrite").save()
    t0 = time.time()
    q.fn(spark, SF1).write.format("noop").mode("overwrite").save()
    sec = time.time() - t0
    print(json.dumps({"query": name, "cpus": cpus, "sf": "1.0", "sec": round(sec, 2)}), flush=True)


def main() -> None:
    if sys.argv[1] != "--all":
        run_point(int(sys.argv[1]), sys.argv[2])
        return
    here = os.path.abspath(__file__)
    results: dict[str, dict[int, float]] = {}
    for name in PROBE:
        for cpus in (32, 8):
            env = dict(os.environ)
            out = subprocess.run(
                [sys.executable, here, str(cpus), name],
                capture_output=True, text=True, env=env,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if not line:
                print(f"FAILED {name}@{cpus}: {out.stderr[-300:]}", flush=True)
                continue
            rec = json.loads(line[-1])
            results.setdefault(name, {})[cpus] = rec["sec"]
            print(line[-1], flush=True)
    print(f"\n{'query':34s} {'sec@32':>8s} {'sec@8':>8s} {'8/32':>6s}")
    for name, r in results.items():
        if 32 in r and 8 in r:
            print(f"{name:34s} {r[32]:8.2f} {r[8]:8.2f} {r[8] / r[32]:6.2f}")


if __name__ == "__main__":
    main()
