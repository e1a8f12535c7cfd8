#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "headline_wall_sec", "value": <total>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Materialization is a noop-sink write (format("noop")) — full plan
executes, nothing collects to the driver, so timings reflect the
distributed plan, not driver serialization.

--passes N (or $SPARK_GRAFT_BENCH_PASSES, default 2): run the whole
query loop N times and report each query's MIN across passes — the
min-of-N discipline applied across the suite, not just within a query
(r14 verdict task 7: three of four r14 bench sessions self-flagged at
least one run; a single-pass reading inherits whatever burst hit its
pass). Raw per-pass totals ride along as "pass_totals".
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative slice of SURVEY.md §2: scan+agg, star join, top-k,
# as-of, windows, sessionization, manifest build, dedup (exact + LSH),
# similarity search, STAC assembly+search.
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_nation_revenue",
    "q9_profit_by_nation_year",
    "q18_large_volume_customers",
    "join_asof",
    "topk_per_group",
    "window_frame",
    "t4_session_window",
    "st2_tumbling_stream",
    "s4_manifest",
    "x1_exact_dedup",
    "x2_minhash_lsh",
    "x3_cosine_topk",
    "x4_contamination",
    "stac_catalog_search",
]


def _calibration_sec(spark) -> float:
    """FROZEN host-speed canary — never change this workload. Pure
    Spark (range → sha256 → shuffle → agg), zero engine code, so the
    number moves with the HOST, not with the repo: BENCH readers divide
    the headline by this to compare rounds across host-speed swings
    (round 9 burned a day on a +49% 'regression' that was entirely the
    host — see SCALE.md 'Measuring on a shared/noisy host'). Min-of-5
    like the headline queries, after 6 UNTIMED warmups: the round-13
    bracketing exposed that a canary measured early in JVM life reads
    its own codegen/JIT ramp (pre ~1.7× post, consistently), which
    would fire the drift flag on every run — the warmups make the two
    bracket readings measure the HOST, not the canary's position in
    JVM warm-up. The measured workload itself is unchanged (frozen)."""
    import pyspark.sql.functions as F

    def once() -> None:
        (
            spark.range(0, 8_000_000, 1, 32)
            .select(F.sha2(F.col("id").cast("string"), 256).alias("h"))
            .groupBy(F.substring("h", 1, 2).alias("b"))
            .agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("m"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    for _ in range(6):
        once()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        (
            spark.range(0, 8_000_000, 1, 32)
            .select(F.sha2(F.col("id").cast("string"), 256).alias("h"))
            .groupBy(F.substring("h", 1, 2).alias("b"))
            .agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("m"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--passes",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2")),
        help="full query-loop passes; per-query time = min across passes",
    )
    args = ap.parse_args()
    passes = max(args.passes, 1)

    from recipes_spark.registry import all_queries
    from recipes_spark.session import get_session

    spark = get_session("recipes-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # Warm the JVM + parquet footers so q1 doesn't pay one-time costs,
    # and pre-stage the streaming landing directory (environment setup —
    # in production the landing zone exists before any query runs).
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    from recipes_spark.streaming.core import stage_events

    stage_events(spark, SF_DIR)

    # Warm the Python workers too: the first Arrow UDF query otherwise
    # pays one worker spawn per core — daemon startup cost, not plan
    # cost (workers are reused afterwards; on a cluster they're
    # long-lived).
    import pandas as _pd

    spark.range(0, 1024, 1, int(spark.sparkContext.defaultParallelism)).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).write.format("noop").mode("overwrite").save()

    # Min of 3 CONSECUTIVE runs per query: measures the steady-state
    # plan, not the one-time whole-stage-codegen compile of run 1.
    # (Interleaving the passes was tried and is systematically slower:
    # the suite's generated-code units overflow the JVM's bounded
    # codegen compile cache between passes, so every pass recompiles.)
    # Min of 5 (was 3): on this host the JVM's JIT takes 3-4 executions
    # of a CPU-heavy plan to reach steady state (measured: the same
    # query swings 4.8 → 3.2 → 1.8 → 1.4 s across consecutive runs), so
    # min-of-3 was recording the interpreter ramp, not the plan. A
    # long-lived cluster executor never pays that ramp per query.
    # Canary BEFORE the query loop (the r12 lesson: one canary reading
    # taken after the loop missed a load burst INSIDE it and a judge
    # round went to adjudicating a phantom 68% regression).
    calib_pre = _calibration_sec(spark)

    timings: dict[str, float] = {}
    pass_totals: list[float] = []
    for _p in range(passes):
        pass_total = 0.0
        for name in HEADLINE:
            fn = queries[name]
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            pass_total += best
            prev = timings.get(name, float("inf"))
            timings[name] = round(min(prev, best), 3)
        pass_totals.append(round(pass_total, 3))

    # ... and AFTER: the two readings bracket the loop, so a host load
    # burst during the queries shows up as canary drift instead of
    # masquerading as an engine regression.
    calib_post = _calibration_sec(spark)
    calib = min(calib_pre, calib_post)
    drift = abs(calib_pre - calib_post) / calib
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # Host-speed canary (frozen workload, see
                # _calibration_sec): headline/calib is the
                # host-normalized number to compare across rounds.
                # TWO readings bracket the query loop; calib_sec is
                # their min (the host's demonstrated best, matching
                # every query's own min-of-5 convention).
                "calib_sec": calib,
                "calib_pre_sec": calib_pre,
                "calib_post_sec": calib_post,
                # >25% pre/post drift = the host shifted UNDER the run:
                # treat value/value_per_calib as unreliable and re-run
                # before reading anything into a round-over-round diff.
                "calib_drift": round(drift, 3),
                "unreliable_run": drift > 0.25,
                "value_per_calib": round(total / calib, 2),
                # min-of-passes discipline (see module docstring): the
                # headline is the per-query min across `passes` full
                # loops; raw per-pass sums expose any burst one pass ate.
                "passes": passes,
                "pass_totals": pass_totals,
            }
        )
    )


if __name__ == "__main__":
    main()
