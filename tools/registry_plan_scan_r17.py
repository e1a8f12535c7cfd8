#!/usr/bin/env python
"""Round-17 registry-wide plan scan: for EVERY registered query, time
the BUILD (fn() call — driver-side Catalyst work plus any embedded
driver actions/checkpoints), capture the formatted physical plan, and
summarize its shape: per-table parquet scan counts, exchange count,
Python-eval nodes. Two r17 work items feed off this one pass:

- VERDICT item 2 (Q18-style aggregate-reuse sweep): queries scanning
  the same fact table more than once are collapse candidates.
- VERDICT item 4 (expression-string long tail): the top builders by
  build_sec are the conversion targets.

Usage:
  python tools/registry_plan_scan_r17.py [--sf-dir /root/testdata/sf0.01]
         [--only a,b] [--skip-slow]
Prints one JSON line per query and a final summary (top build times,
multi-scan queries).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
import time
from collections import Counter
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    from recipes_spark.registry import all_queries
    from recipes_spark.session import get_session
    from recipes_spark.streaming.core import stage_events

    spark = get_session("registry-plan-scan-r17")
    spark.sparkContext.setLogLevel("ERROR")
    stage_events(spark, args.sf_dir)
    only = {q for q in args.only.split(",") if q}

    results = []
    for name, fn in all_queries().items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"plan-scan:{name}")
        t0 = time.perf_counter()
        try:
            df = fn(spark, args.sf_dir)
            build = round(time.perf_counter() - t0, 3)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — survey tool
            print(json.dumps({"name": name, "error": str(exc)[:160]}),
                  flush=True)
            continue
        finally:
            spark.sparkContext.setJobDescription(None)
        # Count each detail-section scan header once, attribute to table.
        tables = Counter()
        for m in re.finditer(r"\(\d+\) Scan parquet ?\n(?:Output.*\n)?"
                             r"Batched.*\nLocation.*?\[(.*?)[,\]]", plan):
            tables[os.path.basename(m.group(1)).removesuffix(".parquet")] += 1
        if not tables:
            for m in re.finditer(r"Location: InMemoryFileIndex[^\n]*?"
                                 r"([a-z_0-9]+)\.parquet", plan):
                tables[m.group(1)] += 1
        n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
        rec = {
            "name": name,
            "build_sec": build,
            "scans": n_scans,
            "tables": dict(tables),
            "multi": sorted(
                t for t, c in tables.items() if c > 1
            ),
            "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
            "pyeval": len(re.findall(
                r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow",
                plan)),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    by_build = sorted(results, key=lambda r: -r["build_sec"])[:40]
    multi = [r["name"] for r in results if r["multi"]]
    print(json.dumps({
        "n": len(results),
        "build_total_sec": round(sum(r["build_sec"] for r in results), 1),
        "top_build": [(r["name"], r["build_sec"]) for r in by_build],
        "multi_scan_queries": multi,
    }))


if __name__ == "__main__":
    main()
