"""Salted join/agg equivalence: same results as the plain forms, with
the salt spreading a hot key across partitions."""

from __future__ import annotations

import pyspark.sql.functions as F

from recipes_spark.io import load
from recipes_spark.operators.skew import salted_agg, salted_join


def test_salted_join_matches_plain(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    plain = o.join(c, o.o_custkey == c.c_custkey).count()
    salted = salted_join(
        o, c, fact_key="o_custkey", dim_key="c_custkey",
        salt=8, unique_col="o_orderkey",
    )
    assert salted.count() == plain
    # Hot-key spread: the salt column actually took >1 value per key.
    spread = (
        o.withColumn("__salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(8)))
        .groupBy("o_custkey")
        .agg(F.countDistinct("__salt").alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    assert spread > 1


def test_salted_agg_matches_plain(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    plain = {
        r["l_orderkey"]: (r["s"], r["n"])
        for r in li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r["l_orderkey"]: (r["s"], r["n"])
        for r in salted_agg(
            li,
            "l_orderkey",
            [("sum", "l_quantity", "s"), ("count", "l_linenumber", "n")],
            salt=8,
            unique_col="l_linenumber",
        ).collect()
    }
    assert len(plain) == len(salted)
    for k, (s, n) in plain.items():
        ss, sn = salted[k]
        assert abs(ss - s) < 1e-6 and sn == n


def test_salted_windowed_agg_matches_plain(spark, sf_dir):
    """Salted (key, window) two-phase rollup must equal the plain
    groupBy(key, window) aggregation exactly — the hot-key variant of
    the windowed rollup every events pipeline runs."""
    import pyspark.sql.functions as F

    from recipes_spark.io import load
    from recipes_spark.operators.skew import salted_windowed_agg

    ev = load(spark, sf_dir, "events")
    salted = salted_windowed_agg(
        ev,
        time_col="ts",
        window_duration="30 minutes",
        key="event_type",
        aggs=[("count", "event_id", "n"), ("sum", "value", "sv"), ("max", "value", "mx")],
        salt=8,
        unique_col="event_id",
    )
    w = F.window("ts", "30 minutes")
    plain = (
        ev.groupBy("event_type", w.alias("__w"))
        .agg(
            F.count("event_id").alias("n"),
            F.sum("value").alias("sv"),
            F.max("value").alias("mx"),
        )
        .select(
            "event_type",
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            "n", "sv", "mx",
        )
    )
    key = lambda r: (r.event_type, r.window_start)
    got = {key(r): (r.n, round(r.sv, 6), r.mx) for r in salted.collect()}
    want = {key(r): (r.n, round(r.sv, 6), r.mx) for r in plain.collect()}
    assert got == want


def test_salted_join_rejects_outer(spark, sf_dir):
    """Outer joins would duplicate unmatched dim rows salt times —
    the operator must refuse them."""
    import pytest

    from recipes_spark.io import load
    from recipes_spark.operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    with pytest.raises(ValueError, match="outer"):
        salted_join(
            li, o, fact_key="l_orderkey", dim_key="o_orderkey",
            how="full", unique_col="l_linenumber",
        )
