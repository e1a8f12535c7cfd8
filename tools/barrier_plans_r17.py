#!/usr/bin/env python
"""Round-17 evidence probe for checkpoint-barrier queries (x2 family).

A query whose operator materializes intermediates with eager
``localCheckpoint`` hides its real execution from the final
``explain`` — the returned plan reads ``Scan ExistingRDD`` nodes and
the corpus scans live inside the build-time checkpoint jobs. This
probe wraps ``DataFrame.localCheckpoint`` to capture EVERY barrier's
formatted physical plan (before materialization) plus the final plan,
so plans/r17 files show the whole pipeline: how many barriers run,
and how many parquet scans / tokenize passes each contains.

Usage:
  python tools/barrier_plans_r17.py --queries x2_minhash_lsh \
         --plans-dir plans/r17 --tag before

Also prints one JSON line per query: barrier count and per-barrier
parquet-scan counts — the "single documents scan" claim, checkable.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--plans-dir", default="plans/r17")
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    from recipes_spark.registry import all_queries
    from recipes_spark.session import get_session

    spark = get_session("barrier-plans-r17")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    os.makedirs(args.plans_dir, exist_ok=True)

    # Patch the CONCRETE DataFrame class (Spark 4 sessions build
    # pyspark.sql.classic.dataframe.DataFrame; the pyspark.sql.DataFrame
    # base's method is shadowed by the subclass override).
    DataFrame = type(spark.range(1))
    orig = DataFrame.localCheckpoint
    captured: list[str] = []

    def capturing(self, eager=True):
        captured.append(_formatted(self))
        return orig(self, eager)

    for name in [q for q in args.queries.split(",") if q]:
        captured.clear()
        DataFrame.localCheckpoint = capturing
        try:
            df = queries[name](spark, SF_DIR)
        finally:
            DataFrame.localCheckpoint = orig
        final = _formatted(df)
        sections = [
            f"== barrier {i + 1} (localCheckpoint) ==\n{p}"
            for i, p in enumerate(captured)
        ] + [f"== final plan ==\n{final}"]
        text = "\n".join(sections)
        out = os.path.join(args.plans_dir, f"{name}_{args.tag}.txt")
        with open(out, "w") as fh:
            fh.write(text)
        scans = [
            len(re.findall(r"Scan parquet", p)) for p in captured
        ] + [len(re.findall(r"Scan parquet", final))]
        print(
            json.dumps(
                {
                    "name": name,
                    "tag": args.tag,
                    "barriers": len(captured),
                    "parquet_scans_per_section": scans,
                    "total_parquet_scans": sum(scans),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
