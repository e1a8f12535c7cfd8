#!/usr/bin/env python
"""Round-17 job-count probe: run named registered queries noop-sink
under a job group and report HOW MANY Spark jobs each chain launches
plus wall time. The index-lifecycle chains are multi-job by declared
semantics (train rounds, snapshot commits, digest re-reads) — but each
job carries ~100-250 ms of fixed scheduling cost at sf0.01, so the
optimization target (VERDICT r16 item 5) is jobs-per-chain, and this
probe is the before/after evidence for it.

Usage:
  python tools/job_count_probe_r17.py --queries x3_index_commit,... \
      [--runs 2] [--tag before]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    from recipes_spark.registry import all_queries
    from recipes_spark.session import get_session
    from recipes_spark.streaming.core import stage_events

    spark = get_session("job-count-probe-r17")
    spark.sparkContext.setLogLevel("ERROR")
    stage_events(spark, SF_DIR)
    sc = spark.sparkContext
    queries = all_queries()

    for name in [q for q in args.queries.split(",") if q]:
        walls, jobs = [], []
        for i in range(args.runs):
            group = f"probe_{name}_{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.perf_counter() - t0, 3))
            sc.setJobGroup(None, None)
            jobs.append(len(sc.statusTracker().getJobIdsForGroup(group)))
        print(
            json.dumps(
                {
                    "name": name,
                    "tag": args.tag,
                    "jobs_per_run": jobs,
                    "walls": walls,
                    "best_wall": min(walls),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
