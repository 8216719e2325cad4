"""Round-16 one-off full-registry bench sweep (VERDICT r15 item 3).

142 of 192 registered queries had no timing history — the bench HEADLINE
set tracks from birth only, so a perf outlier outside it would be
invisible to the regression gate. This sweep runs EVERY registered query
at sf0.1 (noop sink, the bench.py measurement discipline: one warm-up
pass, then interleaved rounds, median of 3), prints one JSON line per
query, and ends with the outlier report: non-HEADLINE queries whose
median exceeds the threshold (default 2.5 s — the r15 headline p90),
which should then be folded into HEADLINE or have their plan adjudicated
in SCALE.md.

Usage: python docs/bench_sweep_all.py [threshold_sec]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
MEDIAN_OF = 3


def main() -> None:
    import bench
    from hadoop_web_browsing_logs_spark.plans.registry import all_queries
    from hadoop_web_browsing_logs_spark.session import get_spark

    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 2.5
    spark = get_spark("bench_sweep", cpus=32)
    queries = all_queries()
    names = sorted(queries)

    def run_once(n: str) -> float:
        t0 = time.perf_counter()
        queries[n].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for n in names:  # warm-up pass
        run_once(n)
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(MEDIAN_OF):
        for n in names:
            samples[n].append(run_once(n))

    med = {n: round(statistics.median(ts), 3) for n, ts in samples.items()}
    for n in names:
        print(json.dumps({"query": n, "median_sec": med[n],
                          "samples": [round(x, 3) for x in samples[n]]}), flush=True)

    headline = set(bench.HEADLINE)
    outliers = {
        n: s for n, s in med.items() if s > threshold and n not in headline
    }
    print(json.dumps({
        "sweep": "full-registry",
        "n_queries": len(names),
        "threshold_sec": threshold,
        "total_sec": round(sum(med.values()), 1),
        "untracked_outliers": dict(sorted(outliers.items(), key=lambda kv: -kv[1])),
        "slowest_10": dict(sorted(med.items(), key=lambda kv: -kv[1])[:10]),
    }), flush=True)


if __name__ == "__main__":
    main()
