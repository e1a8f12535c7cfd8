#!/usr/bin/env python
"""Round-17 scaling probe (VERDICT r16 item 7): one larger-SF reading.

At sf0.1 every headline query is fixed-cost-bound (scheduler, stream
planning, py4j) — the 8-vs-32-core ratio reads ~1.0 and the bench can
no longer detect a data-path regression that only shows under load.
This probe builds a synthetic ~sfN dataset by replicating the sf0.1
TPC-H fact tables with key-shifted copies (orders/lineitem keys offset
per replica so the o_orderkey ⟷ l_orderkey join relation is preserved;
dimension tables are shared, so each customer simply owns N× orders),
then times the 5 TPC-H headline legs noop-sink at two core counts.

This is MEASUREMENT TOOLING ONLY: nothing in the engine or bench reads
the replicated data; results land in plans/r17/scaling_r17.json and
OPTIMIZATION_r17.md. Query outputs at the synthetic SF are not
oracle-comparable (duplicate rows by construction) — only the timing
and the core-count ratio matter.

Usage:
  python tools/scaling_probe_r17.py --build --factor 20
  SPARK_GRAFT_CPUS=32 python tools/scaling_probe_r17.py --run
  SPARK_GRAFT_CPUS=8  python tools/scaling_probe_r17.py --run
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale")

LEGS = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_nation_revenue",
    "q9_profit_by_nation_year",
    "q18_large_volume_customers",
]


def build(factor: int) -> None:
    import pyspark.sql.functions as F

    from recipes_spark.io import load
    from recipes_spark.session import get_session

    spark = get_session("scaling-probe-build")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)

    orders = load(spark, SRC, "orders")
    li = load(spark, SRC, "lineitem")
    # Key offset larger than any real orderkey so replicas never collide.
    max_ok = orders.agg(F.max("o_orderkey")).first()[0] + 1
    rep = spark.range(factor).withColumnRenamed("id", "__rep")

    (
        orders.crossJoin(rep)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__rep") * max_ok)
        .drop("__rep")
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{DST}/orders.parquet")
    )
    (
        li.crossJoin(rep)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__rep") * max_ok)
        .drop("__rep")
        .repartition(256)
        .write.mode("overwrite")
        .parquet(f"{DST}/lineitem.parquet")
    )
    # Dimensions ride along unchanged (shared keys across replicas).
    for t in ("customer", "supplier", "part", "nation", "region",
              "events", "documents", "embeddings"):
        load(spark, SRC, t).write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
    print(json.dumps({"built": DST, "factor": factor}))


def run() -> None:
    from recipes_spark.registry import all_queries
    from recipes_spark.session import get_session

    spark = get_session("scaling-probe-run")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    queries = all_queries()
    spark.read.parquet(f"{DST}/lineitem.parquet").count()  # warm footers
    out = {}
    for name in LEGS:
        spark.sparkContext.setJobDescription(f"scale:{name}")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            queries[name](spark, DST).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"cpus": int(cpus), "dir": DST, "queries": out,
                      "total": round(sum(out.values()), 3)}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--factor", type=int, default=20)
    args = ap.parse_args()
    if args.build:
        build(args.factor)
    if args.run:
        run()


if __name__ == "__main__":
    main()
