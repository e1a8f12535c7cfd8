"""Intent-level tests for the round-7 fifth-wave operators on PLANTED
inputs (rationale in test_intent_round7.py): each operator's defining
semantic is pinned where the intended and the plausible-but-wrong
versions diverge."""

from __future__ import annotations

import datetime as dt
import math
import os

from pyspark.sql import Row

from recipes_spark.registry import all_queries

QUERIES = all_queries()

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write(spark, tmp_path, name, rows, schema=None):
    df = spark.createDataFrame(rows, schema) if schema else spark.createDataFrame(rows)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), f"{name}.parquet")
    )
    return str(tmp_path)


def _events(spark, tmp_path, rows):
    """rows = (event_id, user_id, minutes_after_T0, event_type, value)."""
    return _write(
        spark, tmp_path, "events",
        [
            Row(event_id=i, ts=T0 + dt.timedelta(minutes=m), user_id=u,
                event_type=et, value=v, props="{}")
            for i, u, m, et, v in rows
        ],
    )


def _base_bucket(spark, hours=1):
    us = 3_600_000_000 * hours
    return spark.sql(
        f"SELECT unix_micros(timestamp'2024-01-01 00:00:00') div {us} AS b"
    ).first()["b"]


def test_drawdown_counts_silent_hours_and_takes_earliest_trough(
    spark, tmp_path
):
    """Hourly cents [300, 300, 0, 300, 300, 600] (hour 2 has NO events —
    only the zero-filled grid sees the dip): mean 300, centered equity
    *6 = [0, 0, -1800, -1800, -1800, 0], so max drawdown 1800 scaled
    (= 300 cents) is TIED across hours 2..4 and the earliest trough
    (hour 2) must win. Observed-only buckets would report zero
    drawdown; a latest-tie argmax would report hour 4."""
    rows = [(1, 1, 0, "view", 3.0), (2, 1, 60, "view", 3.0),
            (3, 1, 180, "view", 3.0), (4, 1, 240, "view", 3.0),
            (5, 1, 300, "view", 3.0), (6, 1, 301, "view", 3.0)]
    d = _events(spark, tmp_path, rows)
    got = QUERIES["window_drawdown"](spark, d).collect()
    assert len(got) == 1
    r = got[0]
    assert r["dd_scaled"] == 1800
    assert r["dd_cents"] == 300
    assert r["trough_bucket"] == _base_bucket(spark) + 2


def test_rfm_quintiles_and_tie_determinism(spark, tmp_path):
    """Users 1..5 with 1..5 events each, all on the same day: frequency
    and monetary quintiles are exactly 1..5; recency is IDENTICAL for
    everyone, so r_score is decided purely by the user_id tiebreak
    (1..5 in id order) — without the tiebreak the assignment would be
    engine-dependent. User 5 (r=5, f=5) is a champion; user 1
    (r=1, f=1) is at_risk."""
    rows = []
    eid = 0
    for u in range(1, 6):
        for k in range(u):
            rows.append((eid, u, k, "view", 1.0))
            eid += 1
    d = _events(spark, tmp_path, rows)
    got = {r["user_id"]: r for r in QUERIES["event_rfm_segments"](spark, d).collect()}
    assert [got[u]["f_score"] for u in range(1, 6)] == [1, 2, 3, 4, 5]
    assert [got[u]["m_score"] for u in range(1, 6)] == [1, 2, 3, 4, 5]
    assert [got[u]["recency_days"] for u in range(1, 6)] == [0] * 5
    assert [got[u]["r_score"] for u in range(1, 6)] == [1, 2, 3, 4, 5]
    assert got[5]["segment"] == "champion"
    assert got[1]["segment"] == "at_risk"
    assert got[2]["segment"] == "at_risk"


def test_seasonal_profile_includes_zero_filled_slots(spark, tmp_path):
    """Hour-of-day 0 sees 200 cents on day 1 and NOTHING on day 2 (the
    day-2 slot exists only via zero-fill): its profile mean must be
    100, not 200 — the observed-only version would report a zero
    residual on day 1 and miss day 2 entirely. Day-2 hour 0's
    residual is exactly -100 (floor of a negative stays exact on the
    integer grid)."""
    rows = [(1, 1, 0, "view", 2.0),        # day 1, hod 0: 200 cents
            (2, 1, 60, "view", 1.0),       # day 1, hod 1: 100 cents
            (3, 1, 24 * 60 + 60, "view", 3.0)]  # day 2, hod 1: 300 cents
    d = _events(spark, tmp_path, rows)
    base = _base_bucket(spark)
    got = {r["bucket"]: r for r in
           QUERIES["ts_seasonal_decompose"](spark, d).collect()}
    assert len(got) == 26  # day1 h0 .. day2 h1 inclusive, zero-filled
    d1h0, d2h0 = got[base], got[base + 24]
    assert (d1h0["x"], d2h0["x"]) == (200, 0)
    assert d1h0["seasonal_micro"] == 100_000_000
    assert d1h0["resid_micro"] == 100_000_000
    assert d2h0["resid_micro"] == -100_000_000
    d1h1, d2h1 = got[base + 1], got[base + 25]
    assert d1h1["seasonal_micro"] == 200_000_000
    assert d1h1["resid_micro"] == -100_000_000
    assert d2h1["resid_micro"] == 100_000_000


def test_km_censored_at_event_time_stay_at_risk(spark, tmp_path):
    """Five users, one segment: two purchase at day 2, one is censored
    AT day 2, one purchases at day 5, one censored at day 7. The
    day-2 risk set must be ALL FIVE (the same-day censored user still
    counts — dropping them is the classic KM mistake and would give
    n=4), and day 5's risk set is 2 (5 minus the three who left at
    day 2). Censor-only times emit no row. logs_micro is the
    per-term floor of 1e6*ln((n-d)/n) and logs_cum the exact integer
    prefix sum."""
    day = 24 * 60
    rows = [
        (1, 1, 0, "signup", 1.0), (2, 1, 2 * day, "purchase", 1.0),
        (3, 2, 0, "signup", 1.0), (4, 2, 2 * day, "purchase", 1.0),
        (5, 3, 0, "signup", 1.0), (6, 3, 2 * day, "view", 1.0),
        (7, 4, 0, "signup", 1.0), (8, 4, 5 * day, "purchase", 1.0),
        (9, 5, 0, "signup", 1.0), (10, 5, 7 * day, "view", 1.0),
    ]
    d = _events(spark, tmp_path, rows)
    _write(
        spark, tmp_path, "customer",
        [Row(c_custkey=u, c_mktsegment="S") for u in range(1, 6)],
    )
    got = QUERIES["agg_survival_km"](spark, d).collect()
    assert [(r["t_days"], r["n_risk"], r["d_events"], r["c_censored"])
            for r in got] == [(2, 5, 2, 1), (5, 2, 1, 0)]
    l2 = math.floor(1e6 * math.log(3 / 5))
    l5 = math.floor(1e6 * math.log(1 / 2))
    assert [r["logs_micro"] for r in got] == [l2, l5]
    assert [r["logs_cum"] for r in got] == [l2, l2 + l5]
