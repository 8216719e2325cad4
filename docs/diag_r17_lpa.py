"""Round-17 LPA sf1.0 diagnosis (VERDICT r16 item 5: 'the ≈1 ones diagnosed').

The sf1.0 core probe read label_propagation INVERTED: 40.7 s @32 cores vs
23.6 s @8 — slower in absolute terms with more cores. This runs one LPA
point with the UI enabled and dumps per-stage metrics (executor run time,
GC, shuffle bytes, task count) from the local REST API, so the bill can be
attributed: partition count, driver loop, skew, or memory pressure.

Usage: python docs/diag_r17_lpa.py <cpus> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SF = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"


def main():
    from hadoop_web_browsing_logs_spark.plans.registry import get_query
    from hadoop_web_browsing_logs_spark.session import get_spark

    spark = get_spark(f"diag_lpa_{CPUS}", cpus=CPUS, extra_conf={"spark.ui.enabled": "true"})
    q = get_query("q_graph_label_propagation")
    # warm-up (JVM/parquet footers + the memoized edge list), then timed
    q.fn(spark, SF).write.format("noop").mode("overwrite").save()
    t0 = time.time()
    q.fn(spark, SF).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    print(f"wall {wall:.2f}s @ {CPUS} cores", flush=True)

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app_id}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print(f"{'stage':>6} {'tasks':>5} {'runT(s)':>8} {'gc(s)':>6} {'shufR(MB)':>9} "
          f"{'shufW(MB)':>9} {'in(MB)':>8} name")
    for s in stages[:18]:
        print(
            f"{s['stageId']:>6} {s['numCompleteTasks']:>5} "
            f"{(s.get('executorRunTime') or 0)/1e3:>8.1f} "
            f"{(s.get('jvmGcTime') or 0)/1e3:>6.1f} "
            f"{(s.get('shuffleReadBytes') or 0)/1e6:>9.1f} "
            f"{(s.get('shuffleWriteBytes') or 0)/1e6:>9.1f} "
            f"{(s.get('inputBytes') or 0)/1e6:>8.1f} "
            f"{s.get('name','')[:60]}",
            flush=True,
        )
    # task-level skew for the top-3 stages: max vs median duration
    for s in stages[:3]:
        sid, att = s["stageId"], s["attemptId"]
        det = json.load(urllib.request.urlopen(f"{base}/stages/{sid}/{att}/taskSummary?quantiles=0.5,1.0"))
        dur = det.get("duration") or det.get("executorRunTime")
        if dur:
            print(f"stage {sid} task duration median/max: {dur[0]/1e3:.2f}s / {dur[1]/1e3:.2f}s", flush=True)


if __name__ == "__main__":
    main()
