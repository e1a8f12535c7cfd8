"""Custom applyInPandasWithState sessionizer vs the batch
gaps-and-islands sessionization (SURVEY.md §2.10/§2.11)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from recipes_spark.io import load
from recipes_spark.streaming.stateful import GAP_SECONDS, sessionize_stateful

SF = "/root/testdata/sf0.001"


def _batch_sessions(spark):
    """Reference: gaps-and-islands over the same events."""
    ev = load(spark, SF, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")
    marked = ev.withColumn(
        "new_s", F.when(gap.isNull() | (gap >= GAP_SECONDS), 1).otherwise(0)
    )
    numbered = marked.withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        numbered.groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def test_stateful_sessions_match_batch(spark):
    got = sessionize_stateful(spark, SF).collect()
    expect = {
        (r.user_id, r.session_start): (r.n_events, float(r.sum_value))
        for r in _batch_sessions(spark).collect()
    }
    # Every emitted session must exactly match a batch session.
    assert len(got) > 0
    for r in got:
        key = (r.user_id, r.session_start)
        assert key in expect, f"spurious session {key}"
        n, s = expect[key]
        assert r.n_events == n
        assert abs(r.sum_value - s) < 1e-6
    # Coverage: closed sessions are all there; at most the final open
    # session per user may be withheld by flush timing.
    n_users = len({r.user_id for r in got})
    assert len(got) >= len(expect) - n_users
