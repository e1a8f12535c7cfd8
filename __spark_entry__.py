"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query at sf0.001 (smoke: rows > 0).
queries()     — every implemented operator from SURVEY.md §2, via the
                recipes_spark registry.
oracle_sql()  — DuckDB-equivalent SQL per query (omitted for the
                approximate / non-SQL-expressible ones → rows-only).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from recipes_spark.io import load
from recipes_spark.registry import all_oracles, all_queries

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: revenue rollup by region × return flag — scan, filter
    (pushed down), star join through customer→nation→region with the
    fixed-size dims broadcast, hash agg, sort (SURVEY.md §7 M0)."""
    li = load(spark, SF0001, "lineitem")
    o = load(spark, SF0001, "orders")
    c = load(spark, SF0001, "customer")
    n = load(spark, SF0001, "nation")
    r = load(spark, SF0001, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "l_returnflag")
        .agg(
            F.round(F.sum(revenue), 2).alias("revenue"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "l_returnflag")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
