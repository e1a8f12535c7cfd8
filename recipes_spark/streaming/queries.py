"""Registered streaming queries (SURVEY.md §2.10): the T2/T3 window
aggregations executed under Structured Streaming, watermarked late-data
drop (T5), and stateful dedup (T6).

Oracle strategy: st2/st3/st6 run the whole staged directory in one
availableNow pass — st2/st3 in COMPLETE mode (every window emits
regardless of watermark), st6 as a single micro-batch (no late drops) —
so their results are deterministic and equal to the batch/DuckDB
answer. st5 intentionally splits batches to force watermark drops and
is rows-only (the driver records the weaker check; the exact drop
property is asserted in tests/test_streaming.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from recipes_spark.io import load
from recipes_spark.queries.events import (
    DYNAMIC_SESSION_ORACLE as _DYNAMIC_SESSION_ORACLE,
)
from recipes_spark.queries.events import SESSION_ORACLE as _SESSION_ORACLE
from recipes_spark.queries.events import dynamic_gap_session_agg
from recipes_spark.registry import query
from recipes_spark.streaming.core import run_to_memory, stream_events

_TUMBLING_ORACLE = """
SELECT make_timestamp(CAST(floor(epoch(ts) / 600) AS BIGINT) * 600 * 1000000)
         AS window_start,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""


def tumbling_agg(ev: DataFrame) -> DataFrame:
    """st2's transformation as a plain DataFrame→DataFrame function:
    the SAME expression tree runs streamed (below) and batch —
    withWatermark is a no-op on a batch input, so the batch twin is
    plan-fingerprintable (tools/plan_fingerprints.json st2_batch_side)
    and a regression in the window-agg plan fails the suite even
    though the streaming harness's own plan embeds run-local paths."""
    return (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )


@query("st2_tumbling_stream", oracle=_TUMBLING_ORACLE)
def st2_tumbling_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 streaming: readStream file source → watermark → 10-minute
    tumbling windows → memory sink. Complete mode so the final windows
    (still above watermark at stream end) emit too — result equals the
    batch t2_tumbling_window oracle."""
    agg = tumbling_agg(stream_events(spark, sf_dir))
    return run_to_memory(agg, output_mode="complete", name_hint="st2")


_SLIDING_ORACLE = """
SELECT make_timestamp((CAST(floor(epoch(ts) / 300) AS BIGINT) - k.k)
                      * 300 * 1000000) AS window_start,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS sum_value
FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) k
GROUP BY 1, 2
"""


@query("st3_sliding_stream", oracle=_SLIDING_ORACLE)
def st3_sliding_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 streaming: 10-minute windows sliding every 5 under
    Structured Streaming, complete mode."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )
    return run_to_memory(agg, output_mode="complete", name_hint="st3")


@query(
    "st6_stream_dedup",
    oracle="""
SELECT event_type, count(*) AS n, count(DISTINCT event_id) AS n_ids
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def st6_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 streaming: dropDuplicatesWithinWatermark(event_id) over a
    doubled input (every event twice). Single micro-batch, so no row is
    late; output = exactly one row per event_id, verified by the plain
    per-type distinct-count oracle."""
    ev = stream_events(spark, sf_dir, copies=2)
    dedup = ev.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    sunk = run_to_memory(dedup, output_mode="append", name_hint="st6")
    return (
        sunk.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("event_id").alias("n_ids"),
        )
        .orderBy("event_type")
    )


@query(
    "st8_stream_join",
    oracle="""
SELECT c.event_id AS click_id, p.event_id AS purchase_id,
       c.user_id, c.ts AS click_ts, p.ts AS purchase_ts,
       round(p.value, 2) AS purchase_value
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
""",
)
def st8_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream INNER join: clicks ⋈ purchases by user within a
    1-hour conversion window, both sides watermarked so the join state
    is bounded (Spark retains each side only until the watermark passes
    the time-range bound — without the range condition state grows
    forever at 100 TB). Inner matches emit as found, so one
    availableNow pass over the staged directory equals the batch range
    join — full DuckDB oracle."""
    ev = stream_events(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.round("value", 2).alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select(
        "click_id", "purchase_id", "user_id", "click_ts", "purchase_ts",
        "purchase_value",
    )
    return run_to_memory(joined, output_mode="append", name_hint="st8")


@query(
    "st16_stream_outer_join",
    oracle="""
WITH c AS (
  SELECT event_id AS click_id, user_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
), p AS (
  SELECT event_id AS purchase_id, user_id AS p_user_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
), wm AS (
  SELECT least((SELECT max(ts) FROM events WHERE event_type = 'click'),
               (SELECT max(ts) FROM events WHERE event_type = 'purchase'))
         - INTERVAL 1 HOUR AS w
), matched AS (
  SELECT c.click_id, p.purchase_id, c.user_id, c.click_ts, p.purchase_ts
  FROM c JOIN p
    ON c.user_id = p.p_user_id
   AND p.purchase_ts >= c.click_ts
   AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
), outer_emitted AS (
  SELECT c.click_id, CAST(NULL AS BIGINT) AS purchase_id, c.user_id,
         c.click_ts, CAST(NULL AS TIMESTAMP) AS purchase_ts
  FROM c, wm
  WHERE NOT EXISTS (
          SELECT 1 FROM p
          WHERE p.p_user_id = c.user_id
            AND p.purchase_ts >= c.click_ts
            AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR)
    AND c.click_ts + INTERVAL 1 HOUR < wm.w
)
SELECT * FROM matched
UNION ALL
SELECT * FROM outer_emitted
""",
)
def st16_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join — st8's conversion join with the
    unconverted clicks kept. Outer (null-extended) rows can only emit
    once the watermark proves no match can still arrive: a click's
    state evicts when its match window's upper bound passes the GLOBAL
    watermark (min over both inputs of max event time − delay), and
    availableNow's final no-data batch fires that eviction, so the
    emitted set is deterministic and the oracle derives it exactly —
    all inner matches, plus unmatched clicks with
    click_ts + 1 HOUR < least(max_click_ts, max_purchase_ts) − 1 HOUR
    (the trailing unmatched clicks are WITHHELD, by design: Spark
    cannot rule out a future match for them). At 100 TB this eviction
    bound is also the state-size bound — without the time-range
    condition the outer join would buffer both streams forever."""
    ev = stream_events(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    ).select("click_id", "purchase_id", "user_id", "click_ts", "purchase_ts")
    return run_to_memory(joined, output_mode="append", name_hint="st16")


def session_agg(ev: DataFrame) -> DataFrame:
    """st4's session aggregation (30-min gap per user) — shared by the
    complete-mode registered query and the append-mode emission test."""
    return (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query("st4_session_stream", oracle=_SESSION_ORACLE)
def st4_session_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 streaming: session_window(30 min gap) per user under
    Structured Streaming, COMPLETE mode (round 7) so the trailing
    sessions still above the watermark at availableNow termination
    emit too — output equals the batch twin and carries the full
    gaps-and-islands DuckDB oracle (SURVEY §5.2). The production
    append-mode path (sessions emit once the watermark passes session
    end + gap, trailing sessions withheld) keeps its own guarantee in
    tests/test_streaming.py::test_st4_stream_sessions_subset_of_batch:
    every EMITTED append-mode session equals its batch twin exactly."""
    return run_to_memory(
        session_agg(stream_events(spark, sf_dir)),
        output_mode="complete",
        name_hint="st4",
    )


@query("st15_session_dynamic_stream", oracle=_DYNAMIC_SESSION_ORACLE)
def st15_session_dynamic_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 streaming, dynamic per-event gap: the SAME expression tree as
    the batch t4_session_dynamic_gap (events.dynamic_gap_session_agg —
    errors time out after 10 minutes, everything else 30) under
    Structured Streaming, COMPLETE mode so trailing sessions emit at
    availableNow termination. Shares the running-max gaps-and-islands
    oracle with the batch twin."""
    ev = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    return run_to_memory(
        dynamic_gap_session_agg(ev), output_mode="complete", name_hint="st15"
    )


@query("st5_watermark_late")
def st5_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: watermark drops late data. One file per micro-batch
    (maxFilesPerTrigger=1, mtime-ordered); after the first batches the
    watermark has advanced past older timestamps, so a duplicate replay
    of the directory (copies=2 interleaves a full second pass) mostly
    drops. Rows-only check — the precise drop property is asserted in
    tests/test_streaming.py."""
    ev = stream_events(spark, sf_dir, files=4, copies=2, max_files_per_trigger=1)
    dedup = ev.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    sunk = run_to_memory(dedup, output_mode="append", name_hint="st5")
    return sunk.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.countDistinct("event_id").alias("n_ids"),
        F.max("ts").alias("max_ts"),
    )


@query(
    "st9_stream_static_enrich",
    oracle="""
SELECT c_mktsegment AS segment,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c_mktsegment
ORDER BY segment
""",
)
def st9_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC enrichment join: the streaming side joins a batch
    dimension (customer) re-read per micro-batch — the standard
    enrich-on-ingest pattern (events ⋈ user profile). The static side
    is broadcast, so the stream never shuffles and the join is
    STATELESS (unlike st8's stream-stream buffers: nothing to
    watermark, no state store). One availableNow pass equals the batch
    join — full DuckDB oracle; the rollup runs on the sunk result."""
    ev = stream_events(spark, sf_dir)
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = ev.join(F.broadcast(cust), "user_id").select(
        "c_mktsegment", "value"
    )
    sunk = run_to_memory(enriched, output_mode="append", name_hint="st9")
    return (
        sunk.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("segment")
    )
