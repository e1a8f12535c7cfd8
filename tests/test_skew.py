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
