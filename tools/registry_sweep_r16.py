#!/usr/bin/env python
"""Round-16 sweep: time ONE noop-sink execution of every registered
query at $SPARK_GRAFT_SF_DIR (default sf0.01, the driver's correctness
scale). Finds the operators whose fixed cost is out of line — the
driver replays the whole registry there, so a single 30 s query is a
bigger liability than 50 ms on a headline leg.

Prints one JSON line per query ({name, sec}) and a sorted tail summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from recipes_spark.registry import all_queries
    from recipes_spark.session import get_session

    spark = get_session("registry-sweep-r16")
    spark.sparkContext.setLogLevel("ERROR")
    from recipes_spark.streaming.core import stage_events

    stage_events(spark, SF_DIR)
    spark.range(0, 1024, 1, int(spark.sparkContext.defaultParallelism)).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).write.format("noop").mode("overwrite").save()

    only = [q for q in os.environ.get("SPARK_GRAFT_SWEEP_ONLY", "").split(",") if q]
    results = {}
    for name, fn in all_queries().items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        t0 = time.perf_counter()
        try:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            sec = round(time.perf_counter() - t0, 3)
            results[name] = sec
            print(json.dumps({"name": name, "sec": sec}), flush=True)
        except Exception as exc:  # noqa: BLE001 — survey tool, keep going
            print(
                json.dumps({"name": name, "error": str(exc)[:200]}), flush=True
            )
        spark.sparkContext.setJobDescription(None)
    top = sorted(results.items(), key=lambda kv: -kv[1])[:25]
    print(
        json.dumps(
            {
                "total_sec": round(sum(results.values()), 1),
                "n": len(results),
                "slowest": top,
            }
        )
    )


if __name__ == "__main__":
    main()
