"""Round-16 sf1.0 scaling probe (VERDICT r15 item 2).

Runs the ~10 most shuffle-heavy kernels at sf0.1 (driver data) and at the
controlled 10x upscale /tmp/sf1.0 (docs/make_sf1.py — disjoint-universe
replication, so the data's intrinsic candidate/pair structure is exactly
10x sf0.1's and any super-linear growth is ENGINE-caused). Records
wall-clock, output rows, and — for the prefix-Jaccard family — the
candidate count the verify join consumes. One fresh-ish pass per point
after a session warm-up query; scaling ratios >> ambient noise.

Usage: python docs/scale_probe_sf1.py [--sf01-only|--sf1-only]
Prints one JSON line per (query, sf) and a final summary table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sf1.0"

#: kernel -> registered query name (all run via the registry fn so the
#: probe measures exactly what the driver/bench measure)
PROBE = [
    "q_dedup_jaccard_prefix",      # tau=0.9 prefix join
    "q_dedup_jaccard_prefix_t8",   # tau=0.8 (positional-filter regime)
    "q_dedup_jaccard_prefix_t7",   # tau=0.7 (widest prefix, fallback fraction)
    "q_dedup_containment",         # shingle inverted-index join
    "q_dedup_semantic",            # SemDeDup min_id
    "q_dedup_semantic_keepfar",    # SemDeDup centroid-far
    "q_dedup_minhash_lsh_portable",  # banded LSH pairs
    "q_vec_covariance",            # exact dsum covariance
    "q_vec_covariance_fast",       # BLAS Gram twin
    "q_graph_pagerank",            # iterative, 2 exchanges/iter
    "q_graph_label_propagation",
    "q_graph_triangles",           # degree-oriented wedge join
]


def main() -> None:
    from hadoop_web_browsing_logs_spark.operators.dedup import (
        _jaccard_prefix_candidates,
    )
    from hadoop_web_browsing_logs_spark.plans.registry import get_query
    from hadoop_web_browsing_logs_spark.session import get_spark

    args = set(sys.argv[1:])
    sfs = [("sf0.1", SF01), ("sf1.0", SF1)]
    if "--sf01-only" in args:
        sfs = sfs[:1]
    if "--sf1-only" in args:
        sfs = sfs[1:]

    spark = get_spark("scale_probe", cpus=32)
    # JVM warm-up so the first probed query doesn't eat the startup cost
    get_query("q_filter_project").fn(spark, SF01).count()

    results: dict[str, dict[str, dict]] = {}
    for name in PROBE:
        q = get_query(name)
        results[name] = {}
        for sf_label, sf_dir in sfs:
            t0 = time.time()
            rows = q.fn(spark, sf_dir).count()
            sec = time.time() - t0
            rec = {"sec": round(sec, 2), "rows": rows}
            results[name][sf_label] = rec
            print(json.dumps({"query": name, "sf": sf_label, **rec}), flush=True)
        spark.catalog.clearCache()

    # candidate counts for the prefix family (the quantity the positional
    # filter bounds — the number the verify join actually consumes)
    from pyspark.sql import functions as F  # noqa: F401
    from hadoop_web_browsing_logs_spark.operators.dedup import PAIR_STRIDE

    for tau, key in ((0.9, "t9"), (0.8, "t8"), (0.7, "t7")):
        for sf_label, sf_dir in sfs:
            docs = (
                spark.read.parquet(f"{sf_dir}/documents.parquet")
                .filter(F.col("doc_id") % PAIR_STRIDE == 0)
            )
            t0 = time.time()
            n = _jaccard_prefix_candidates(docs, tau)[1].count()
            print(
                json.dumps(
                    {
                        "candidates": f"jaccard_prefix_{key}",
                        "sf": sf_label,
                        "n": n,
                        "sec": round(time.time() - t0, 2),
                    }
                ),
                flush=True,
            )

    if len(sfs) == 2:
        print(f"\n{'query':34s} {'sf0.1 s':>8s} {'sf1.0 s':>8s} {'x time':>7s} "
              f"{'rows0.1':>9s} {'rows1.0':>9s} {'x rows':>7s}")
        for name, r in results.items():
            a, b = r["sf0.1"], r["sf1.0"]
            print(
                f"{name:34s} {a['sec']:8.2f} {b['sec']:8.2f} "
                f"{b['sec'] / max(a['sec'], 1e-9):7.2f} "
                f"{a['rows']:9d} {b['rows']:9d} "
                f"{b['rows'] / max(a['rows'], 1):7.2f}"
            )


if __name__ == "__main__":
    main()
