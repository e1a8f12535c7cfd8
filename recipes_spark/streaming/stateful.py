"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.10/§2.11): a sessionizer that session_window can't
express — per-session event count AND value aggregate AND first/last
event types, with explicit cross-batch state.

State model: per user_id, the open (not-yet-gap-closed) session's
accumulators persist in GroupState between micro-batches; a session
emits when a later event arrives more than `gap` after its last event.
The open session is deliberately NOT flushed at availableNow
termination — in streaming semantics a session isn't final until its
gap has passed; a long-running deployment would add a processing-time
timeout for liveness (measured here: timeout-service batches under
availableNow delay termination by tens of seconds, so the batch-replay
form keeps closed-only semantics).

Scale notes: state is partitioned by the group key across executors
(the shuffle is the groupBy); per-group state is O(1) (one open
session's accumulators), so 10^9 users is 10^9 small state rows in the
state store, compacted by RocksDB at real deployments.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from recipes_spark.streaming.core import run_to_memory, stream_events

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double, first_type string, last_type string"
)
STATE_SCHEMA = (
    "start long, last long, n long, s double, first_type string, "
    "last_type string"
)

GAP_SECONDS = 30 * 60


def _sessionize(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """One group (user) per call; rows of THIS micro-batch arrive as
    pandas frames. Emits every session closed by this batch; keeps the
    still-open one in state."""
    (user_id,) = key
    frames = [p for p in pdfs if len(p)]
    rows = (
        pd.concat(frames).sort_values("ts")
        if frames
        else pd.DataFrame(columns=["ts", "event_type", "value"])
    )
    out = []

    if state.exists:
        start, last, n, s, ft, lt = state.get
    else:
        start = last = None
        n, s, ft, lt = 0, 0.0, None, None

    def emit(end_last: float) -> None:
        out.append(
            (
                user_id,
                pd.Timestamp(start, unit="us"),
                pd.Timestamp(end_last, unit="us") + pd.Timedelta(seconds=GAP_SECONDS),
                n,
                float(s),
                ft,
                lt,
            )
        )

    for ts, etype, value in zip(
        rows["ts"], rows["event_type"], rows["value"]
    ):
        us = int(ts.value // 1000)  # ns -> us
        if start is None:
            start, last, n, s, ft, lt = us, us, 1, float(value), etype, etype
        elif us - last >= GAP_SECONDS * 1_000_000:
            emit(last)
            start, last, n, s, ft, lt = us, us, 1, float(value), etype, etype
        else:
            last, n, s, lt = us, n + 1, s + float(value), etype

    if start is None:
        state.remove()
    else:
        state.update((start, last, n, s, ft, lt))

    yield pd.DataFrame(
        out,
        columns=[
            "user_id", "session_start", "session_end", "n_events",
            "sum_value", "first_type", "last_type",
        ],
    )


from recipes_spark.registry import query  # noqa: E402


@query(
    "st7_stateful_sessionizer",
    oracle=f"""
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL {GAP_SECONDS} SECOND
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
), closed AS (
  SELECT * FROM numbered
  WHERE sid < (SELECT max(sid) FROM numbered n2
               WHERE n2.user_id = numbered.user_id)
)
SELECT user_id,
       CAST(count(DISTINCT sid) AS BIGINT) AS n_sessions,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM closed
GROUP BY user_id
ORDER BY user_id
""",
)
def st7_stateful_sessionizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful sessionizer, summarized per user. Single
    availableNow batch ⇒ exactly the CLOSED sessions emit (every
    session but each user's last) — the oracle replays that with
    gaps-and-islands minus the max-sid session per user."""
    return (
        sessionize_stateful(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("sum_value"), 2).alias("sum_value"),
        )
        .orderBy("user_id")
    )


def sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the custom sessionizer over the events landing dir. Single
    availableNow batch: every user's full history arrives in one group
    call and only CLOSED sessions emit — under NoTimeout each user's
    final open session is deliberately withheld (it would need a
    timeout or end-of-stream signal to close), matching the oracle,
    which excludes the max-sid session per user."""
    ev = stream_events(spark, sf_dir)
    sessions = (
        ev.groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return run_to_memory(sessions, output_mode="append", name_hint="st7")
