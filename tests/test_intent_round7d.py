"""Intent-level tests for the round-7 fourth-wave operators on PLANTED
inputs (rationale in test_intent_round7.py): each operator's defining
semantic is pinned where the intended and the plausible-but-wrong
versions diverge."""

from __future__ import annotations

import datetime as dt
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


def test_anomaly_stats_use_zero_filled_grid(spark, tmp_path):
    """One type with events only in hours 0 and 48 (10 and 2 events),
    46 empty hours between: over the ZERO-FILLED grid the mean is
    ~0.25 and hour 0 is a screaming anomaly; over observed-only
    buckets the mean would be 6 and NOTHING would flag — the wrong
    version returns an empty report."""
    rows = [(i, 1, 0 + i, "view", 1.0) for i in range(10)]
    rows += [(100, 1, 48 * 60, "view", 1.0), (101, 1, 48 * 60 + 1, "view", 1.0)]
    d = _events(spark, tmp_path, rows)
    got = QUERIES["event_anomaly_buckets"](spark, d).collect()
    assert [r["bucket"] - got[0]["bucket"] for r in got] == [0]
    assert got[0]["n"] == 10


def test_cusum_accumulates_sustained_drift_not_single_spikes(spark, tmp_path):
    """k = ceil(mean): a single large spike resets through the
    running-min drain, but a SUSTAINED +2-above-slack run crosses the
    alarm; verify against a pure-Python sequential
    s = max(0, s + x - k) reference on the same zero-filled series —
    the closed form must equal the recurrence everywhere."""
    # hours 0..39: baseline 1/hour; hours 40..59: 4/hour sustained
    rows = []
    eid = 0
    for h in range(40):
        rows.append((eid, 1, h * 60, "view", 1.0)); eid += 1
    for h in range(40, 60):
        for j in range(4):
            rows.append((eid, 1, h * 60 + j, "view", 1.0)); eid += 1
    d = _events(spark, tmp_path, rows)
    xs = [1] * 40 + [4] * 20
    n = len(xs)
    k = -(-sum(xs) // n)  # ceil mean
    s, ref = 0, []
    for x in xs:
        s = max(0, s + x - k)
        ref.append(s)
    expect = {h: s for h, s in enumerate(ref) if s >= 10}
    got = {
        r["bucket"] - int(T0.timestamp() // 3600): r["cusum"]
        for r in QUERIES["window_cusum"](spark, d).collect()
    }
    assert got == expect
    assert expect, "planted drift must actually alarm"


def test_benford_reports_missing_digits(spark, tmp_path):
    """All prices start with digit 1: digits 2..9 must still appear
    with n_obs = 0 (a LEFT join from the digit spec) — dropping them
    hides the strongest fraud signal — and the chi-square total must
    count their full expected mass."""
    rows = [
        Row(l_returnflag="N", l_linestatus="O", l_quantity=1.0,
            l_extendedprice=1.0 + i / 100.0, l_discount=0.0, l_tax=0.0,
            l_orderkey=i, l_partkey=1, l_suppkey=1, l_linenumber=1,
            l_shipdate=T0)
        for i in range(50)
    ]
    d = _write(spark, tmp_path, "lineitem", rows)
    got = {r["digit"]: r for r in QUERIES["agg_benford"](spark, d).collect()}
    assert sorted(got) == list(range(1, 10))
    assert got[1]["n_obs"] == 50
    assert all(got[d]["n_obs"] == 0 for d in range(2, 10))
    # zero-observation digits contribute (0-e)^2/e = e each
    assert all(got[d]["chi2_part_micro"] > 0 for d in range(2, 10))


def test_balanced_resample_hits_target_exactly(spark, tmp_path):
    """Classes of 7, 3, and 1 docs: every class must land on EXACTLY 7
    (the fractional-weight oversampler that rounds per row cannot
    guarantee this), and the singleton class replicates 7x."""
    rows = [
        Row(doc_id=i, lang=lang, text=f"t{i}", source="s", n_chars=10)
        for i, lang in enumerate(["a"] * 7 + ["b"] * 3 + ["c"])
    ]
    d = _write(spark, tmp_path, "documents", rows)
    got = {
        r["lang"]: (r["n_after"], r["max_copies"])
        for r in QUERIES["x6_balanced_resample"](spark, d).collect()
    }
    assert got["a"] == (7, 1)
    assert got["b"][0] == 7
    assert got["c"] == (7, 7)


def test_winsorized_clamps_instead_of_trimming(spark, tmp_path):
    """20 values: 18 at $1.00, outliers $0.01 and $100.00. The
    winsorized mean must clamp both tails to the p5/p95 cut values
    (here $0.01 stays its own cut at rank 1 and $100 clamps DOWN to
    $1.00), keep n = 20, and land strictly between the raw mean and
    the trimmed-only-high version."""
    prices = [0.01] + [1.0] * 18 + [100.0]
    rows = [
        Row(l_returnflag="N", l_extendedprice=p, l_quantity=1.0,
            l_discount=0.0, l_orderkey=i)
        for i, p in enumerate(prices)
    ]
    d = _write(spark, tmp_path, "lineitem", rows)
    r = QUERIES["agg_winsorized_mean"](spark, d).collect()[0]
    assert r["n"] == 20
    assert r["lo_cents"] == 1 and r["hi_cents"] == 100
    # clamped: one 1-cent + nineteen 100-cent values
    assert r["winsorized_mean_micro"] == (1000000 * (1 + 19 * 100)) // 20


def test_threshold_curve_is_monotone_and_integer_cut(spark, tmp_path):
    """Two identical docs (J = 1.0) and one unrelated: pair counts
    must be monotone non-increasing in the threshold and the exact
    pair must survive at 0.9 while the unrelated pair never enters."""
    rows = [
        Row(doc_id=0, lang="en", source="s", text="alpha beta gamma delta",
            n_chars=22),
        Row(doc_id=1, lang="en", source="s", text="alpha beta gamma delta",
            n_chars=22),
        Row(doc_id=2, lang="en", source="s",
            text="zzz yyy xxx www vvv uuu", n_chars=23),
    ]
    d = _write(spark, tmp_path, "documents", rows)
    got = {
        r["thr"]: (r["n_pairs"], r["n_docs"])
        for r in QUERIES["x2_dedup_threshold_curve"](spark, d).collect()
    }
    counts = [got[t][0] for t in sorted(got)]
    assert counts == sorted(counts, reverse=True)
    assert got[9000] == (1, 2)


def test_shard_checksum_detects_reorder_and_mutation(spark, tmp_path):
    """Same docs, one with two texts swapped between doc ids: every
    shard containing a swapped doc must change its digest (the
    order-sensitivity the record separator + id sort provide)."""
    base = [
        Row(doc_id=i, lang="en", source="s", text=f"text number {i}",
            n_chars=12)
        for i in range(40)
    ]
    d1 = _write(spark, os.path.join(str(tmp_path), "a"), "documents", base)
    swapped = list(base)
    swapped[3], swapped[17] = (
        Row(doc_id=3, lang="en", source="s", text=base[17]["text"], n_chars=12),
        Row(doc_id=17, lang="en", source="s", text=base[3]["text"], n_chars=12),
    )
    d2 = _write(spark, os.path.join(str(tmp_path), "b"), "documents", swapped)
    c1 = {r["shard"]: r["checksum"]
          for r in QUERIES["x6_shard_checksums"](spark, d1).collect()}
    c2 = {r["shard"]: r["checksum"]
          for r in QUERIES["x6_shard_checksums"](spark, d2).collect()}
    import hashlib
    s3 = int(hashlib.sha256(b"3").hexdigest()[:8], 16) % 8
    s17 = int(hashlib.sha256(b"17").hexdigest()[:8], 16) % 8
    touched = {s3, s17}
    for shard in c1:
        if shard in touched:
            assert c1[shard] != c2[shard]
        else:
            assert c1[shard] == c2[shard]
