#!/usr/bin/env python
"""Round-16 optimization probe: per-headline-query breakdown of
driver-side plan-build time vs executed (noop-sink) time, warmup ramp,
and captured .explain("formatted") plans.

Usage:
  python tools/opt_probe_r16.py [--queries a,b,c] [--plans-dir plans/r16]
         [--runs 5] [--tag before]

Prints one JSON line per query:
  {"name":..., "build_sec":..., "runs":[...], "best":..., "tag":...}
and a final summary line. Writes plans to <plans-dir>/<name>_<tag>.txt.

Config overrides for A/B tests ride in via SPARK_GRAFT_PROBE_CONF, a
JSON object of spark confs applied on top of the standard session, e.g.
  SPARK_GRAFT_PROBE_CONF='{"spark.io.compression.codec":"zstd"}'
(the probe is measurement tooling only — bench.py and the registered
queries never read it).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--plans-dir", default="")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    from bench import HEADLINE
    from recipes_spark.registry import all_queries
    from recipes_spark.session import get_session

    names = [q for q in args.queries.split(",") if q] or list(HEADLINE)

    overrides = json.loads(os.environ.get("SPARK_GRAFT_PROBE_CONF", "{}"))
    if overrides:
        # Session-level overrides must land before the JVM session is
        # created; route through a fresh builder mirroring get_session.
        from pyspark.sql import SparkSession

        from recipes_spark.session import DEFAULT_LOCAL_CPUS, configure

        n = DEFAULT_LOCAL_CPUS
        builder = (
            SparkSession.builder.master(f"local[{n}]")
            .appName("opt-probe-r16")
            .config("spark.sql.shuffle.partitions", n)
            .config(
                "spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
            )
            .config("spark.ui.enabled", "false")
        )
        builder = configure(builder)
        for k, v in overrides.items():
            builder = builder.config(k, v)
        spark = builder.getOrCreate()
    else:
        spark = get_session("opt-probe-r16")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # Same environment prep as bench.py.
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    from recipes_spark.streaming.core import stage_events

    stage_events(spark, SF_DIR)
    spark.range(0, 1024, 1, int(spark.sparkContext.defaultParallelism)).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).write.format("noop").mode("overwrite").save()

    total_best = 0.0
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        build = time.perf_counter() - t0

        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())

        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        best = min(runs)
        total_best += best
        print(
            json.dumps(
                {
                    "name": name,
                    "build_sec": round(build, 3),
                    "runs": runs,
                    "best": best,
                    "tag": args.tag,
                }
            ),
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"total_best": round(total_best, 3), "tag": args.tag}))


if __name__ == "__main__":
    main()
