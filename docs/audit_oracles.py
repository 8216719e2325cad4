"""Dual-scale oracle audit — the one-command round evidence (VERDICT r7
item 8): replay every registered oracle against DuckDB using the same
type-sensitive comparator the pytest harness mirrors from the driver, at
EVERY given SF dir (default: sf0.01 AND sf0.1, one Spark session for both).
Usage:

    python docs/audit_oracles.py [sf_dir ...]

Prints one line per (query, sf) and a summary per scale; exit 1 on any FAIL.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import duckdb

from hadoop_web_browsing_logs_spark.plans.registry import all_queries, get_query
from hadoop_web_browsing_logs_spark.session import get_spark
from hadoop_web_browsing_logs_spark.sources.readers import TABLE_NAMES
from tests.conftest import canonical_rows, duck_fetch_typed


def audit_one(spark, sf_dir: str) -> int:
    duck = duckdb.connect()
    for name in TABLE_NAMES:
        duck.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, name + '.parquet')}')"
        )

    names = sorted(n for n, q in all_queries().items() if q.oracle is not None)
    fails = []
    for name in names:
        q = get_query(name)
        try:
            sdf = q.fn(spark, sf_dir)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
            res = duck.execute(q.oracle)
            d_cols, d_rows = duck_fetch_typed(res)
            d_cols = [c.lower() for c in d_cols]
            if sorted(s_cols) != sorted(d_cols):
                raise AssertionError(f"columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
            if len(s_rows) != len(d_rows):
                raise AssertionError(f"rows spark={len(s_rows)} duck={len(d_rows)}")
            if canonical_rows(s_cols, s_rows) != canonical_rows(d_cols, d_rows):
                diffs = [
                    (a, b)
                    for a, b in zip(canonical_rows(s_cols, s_rows), canonical_rows(d_cols, d_rows))
                    if a != b
                ][:3]
                raise AssertionError(f"values differ; first diffs: {diffs}")
            print(f"ok   {name} ({len(s_rows)} rows)", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"FAIL {name}: {e}", flush=True)
            traceback.print_exc(limit=2)
    print(f"\n{len(names) - len(fails)}/{len(names)} oracled queries match at {sf_dir}")
    if fails:
        print("failures:", fails)
    duck.close()
    return 1 if fails else 0


def main() -> int:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))
    spark = get_spark("oracle-audit", cpus=cpus)
    rc = 0
    for sf_dir in sf_dirs:
        rc |= audit_one(spark, sf_dir)
    return rc


if __name__ == "__main__":
    sys.exit(main())
