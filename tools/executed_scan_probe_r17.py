#!/usr/bin/env python
"""Round-17 executed-plan probe: static explain() shows duplicated
subtrees that AQE's exchange/subquery reuse may collapse at runtime,
so the plan-scan tool's multi-scan list over-counts. This probe runs
each named query (collect at sf0.01) and reads the FINAL executed plan:
real parquet-scan count, ReusedExchange/ReusedSubquery nodes, exchange
count — separating genuine repeated-scan queries (aggregate-reuse
candidates, VERDICT item 2) from ones AQE already deduplicates.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    args = ap.parse_args()

    from recipes_spark.registry import all_queries
    from recipes_spark.session import get_session
    from recipes_spark.streaming.core import stage_events

    spark = get_session("executed-scan-probe-r17")
    spark.sparkContext.setLogLevel("ERROR")
    stage_events(spark, SF_DIR)
    queries = all_queries()

    for name in [q for q in args.queries.split(",") if q]:
        try:
            df = queries[name](spark, SF_DIR)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — survey tool
            print(json.dumps({"name": name, "error": str(exc)[:160]}),
                  flush=True)
            continue
        print(
            json.dumps(
                {
                    "name": name,
                    "scans": len(re.findall(r"Scan parquet", plan)),
                    "reused_exchange": plan.count("ReusedExchange"),
                    "reused_subquery": plan.count("ReusedSubquery"),
                    "exchanges": len(
                        re.findall(r"Exchange (?:hash|range|Round|Single)",
                                   plan)
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
