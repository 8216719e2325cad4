"""Round-17 plan-dump tool (VERDICT r16 item 2).

Dumps ``df.explain("formatted")`` for named registered queries into
``plans/r17/<query>_<tag>.txt`` — captured pre-execution at the bench SF
(sf0.1) so the committed shape is the one the driver's claims are checked
against.

GUARD (the r16 lesson): when writing an ``_after`` dump whose ``_before``
twin exists, refuse a byte-identical pair — a stale copy is fabricated
evidence, not a plan diff. Override with ``--allow-identical`` only for a
query whose change is provably plan-invisible (and say so in the ledger).

Usage: python plans/r17/dump_r17.py <tag> <query> [<query> ...]
       (tag is e.g. ``before`` or ``after``; run from anywhere)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, ROOT)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--allow-identical"]
    allow_identical = "--allow-identical" in sys.argv[1:]
    tag, names = args[0], args[1:]

    from hadoop_web_browsing_logs_spark.plans.registry import get_query
    from hadoop_web_browsing_logs_spark.session import get_spark

    spark = get_spark("dump_r17", cpus=8)
    for name in names:
        df = get_query(name).fn(spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out = os.path.join(HERE, f"{name}_{tag}.txt")
        text = buf.getvalue()
        if tag != "before":
            twin = os.path.join(HERE, f"{name}_before.txt")
            if os.path.exists(twin) and open(twin).read() == text and not allow_identical:
                print(f"REFUSED {out}: byte-identical to its _before twin")
                continue
        with open(out, "w") as fh:
            fh.write(text)
        print(f"wrote {out} ({len(text.splitlines())} lines)")


if __name__ == "__main__":
    main()
