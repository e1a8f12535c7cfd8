"""Bucketed co-located joins (SURVEY.md §4.2 / 100 TB design).

At 100 TB the dominant cost of fact-fact joins (lineitem⋈orders,
items⋈granule-metadata) is the shuffle. Bucketing pre-partitions both
tables by the join key at WRITE time, so every subsequent join on that
key is exchange-free: Spark reads bucket i of A and bucket i of B into
the same task. This is the engine's standing replacement for the
reference's "1 file per element" partitioning (avhrr…/recipe.py:123) —
key-aligned instead of arbitrary.

Usage contract: write once with write_bucketed (a saveAsTable — bucket
metadata lives in the session catalog), join many. The sort within
buckets makes the downstream join a zero-sort sort-merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str,
    buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist df as a bucketed (and bucket-sorted) parquet table."""
    writer = df.write.mode("overwrite").format("parquet")
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_l: str, key_r: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys. With equal
    bucket counts the physical plan contains NO Exchange on either side
    (asserted in tests/test_bucketing.py). The MERGE hint pins the
    sort-merge strategy: at 100 TB neither fact side broadcasts, and
    without the hint a small test-scale side would tempt AQE into a
    BroadcastHashJoin, hiding the zero-exchange shape this operator
    exists to provide."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.hint("merge").join(rt.hint("merge"), lt[key_l] == rt[key_r])


def has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a SHUFFLE exchange.
    BroadcastExchange doesn't count: broadcasting a small side moves no
    fact data through a shuffle — it's the plan we WANT for dim joins."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return any(
        line.strip().lstrip("+-: ").startswith("Exchange ")
        for line in plan.splitlines()
    )
