"""Distributed prefix sum (the sequence-packing primitive).

A running total over a global order is the one truly serial dependency
in a pretraining packing plan. The naive Spark encoding —
``Window.orderBy(k)`` with no partitionBy — moves the WHOLE table
through one task (WindowExec warns about exactly this). The scalable
plan is the classic two-pass parallel prefix sum:

    1. range-repartition on the order key (S shards, globally ordered
       across shard ids);
    2. shard-local cumsum via a PARTITIONED window (parallel);
    3. per-shard totals → exclusive scan on the driver (S values, a few
       KB) → broadcast join the offsets back.

Total cost: one range shuffle + one S-row collect, no serial stage.
This mirrors how Beam/Flink express global running aggregates
(per-bundle combine + offset redistribution).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def partitioned_row_number(
    df: DataFrame,
    *,
    order_exprs: list,
    out_col: str = "rn",
    shards: int | None = None,
    partition_by: list[str] | None = None,
    with_total: bool = True,
) -> tuple[DataFrame, int]:
    """Add ``out_col`` = 1-based row number over ``order_exprs`` (a
    total order — include a unique tiebreaker), computed
    shard-parallel, and return ``(df, total_row_count)``. With
    ``partition_by``, the row number restarts per key — the scale-safe
    spelling of ``row_number() OVER (PARTITION BY key ORDER BY ...)``
    when a key is HOT (few distinct values): the naive window funnels
    each key's entire history through one task.

    Same two-pass shape as :func:`partitioned_prefix_sum`: range
    shuffle on (keys, order) — each key's rows land on a contiguous,
    internally ordered shard span — then a shard-LOCAL row_number via
    a (keys, shard)-partitioned window (parallel — no per-key
    single-task sort anywhere in the plan), then per-(key, shard)
    counts exclusive-scanned into offsets and joined back. The global
    scan collects S values on the driver; the per-key scan is itself a
    window over the (keys × shards)-row count table — metadata-sized,
    ordered by shard id within each key — so no driver loop touches
    key cardinality.

    The total count comes free from the per-shard counts (driver-side
    for the global form, one tiny agg over the checkpointed shard
    stage for the per-key form), so callers computing rank-arithmetic
    (e.g. ntile buckets) don't pay a separate full count() job;
    ``with_total=False`` skips even that small job (returns -1) for
    callers that only need the ranks. ``partition_by`` takes column
    NAMES (they key the offset join-back).
    """
    spark = df.sparkSession
    if shards is None:
        shards = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    keys = list(partition_by or [])
    ranged = df.repartitionByRange(shards, *keys, *order_exprs).withColumn(
        "__shard", F.spark_partition_id()
    )
    w = Window.partitionBy(*keys, "__shard").orderBy(*order_exprs)
    local = ranged.withColumn(
        out_col, F.row_number().over(w).cast("long")
    ).localCheckpoint(eager=True)

    if keys:
        counts = local.groupBy(*keys, "__shard").agg(
            F.count(F.lit(1)).cast("long").alias("__n")
        )
        woff = (
            Window.partitionBy(*keys)
            .orderBy("__shard")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        off_df = counts.select(
            *keys,
            "__shard",
            F.coalesce(F.sum("__n").over(woff), F.lit(0))
            .cast("long")
            .alias("__off"),
        )
        out = (
            local.join(off_df, [*keys, "__shard"])
            .withColumn(out_col, F.col(out_col) + F.col("__off"))
            .drop("__shard", "__off")
        )
        if not with_total:
            return out, -1
        total = counts.agg(F.sum("__n").alias("t")).collect()[0]["t"] or 0
        return out, int(total)

    counts = sorted(
        (r["__shard"], r["n"])
        for r in local.groupBy("__shard").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for shard, n in counts:
        offsets.append((shard, acc))
        acc += n
    if not offsets:
        return df.withColumn(out_col, F.lit(None).cast("bigint")), 0
    off_df = F.broadcast(
        spark.createDataFrame(offsets, "__shard int, __off bigint")
    )
    out = (
        local.join(off_df, "__shard")
        .withColumn(out_col, F.col(out_col) + F.col("__off"))
        .drop("__shard", "__off")
    )
    return out, acc


def partitioned_prefix_sum(
    df: DataFrame,
    *,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    shards: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = inclusive running sum of ``value_col`` over the
    global ``order_col`` order, computed shard-parallel.

    ``order_col`` values must be unique (ties across a range-partition
    boundary would make the global order ambiguous). ``shards`` defaults
    to spark.sql.shuffle.partitions. The shard-local stage is
    materialized (localCheckpoint) so the per-shard totals and the final
    join read the SAME range partitioning — at cluster scale swap the
    localCheckpoint for a reliable checkpoint/cache of the (order,
    value, local-cum) projection, which is what a production packing
    planner persists anyway.
    """
    spark = df.sparkSession
    if shards is None:
        shards = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    ranged = df.repartitionByRange(shards, F.col(order_col)).withColumn(
        "__shard", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("__shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn(out_col, F.sum(value_col).over(w)).localCheckpoint(
        eager=True
    )

    # Exclusive scan over per-shard totals: S rows on the driver.
    totals = sorted(
        (r["__shard"], r["tot"] or 0)
        for r in local.groupBy("__shard").agg(F.sum(value_col).alias("tot")).collect()
    )
    offsets, acc = [], 0
    for shard, tot in totals:
        offsets.append((shard, acc))
        acc += tot
    if not offsets:
        return df.withColumn(out_col, F.lit(None).cast("bigint"))
    off_df = F.broadcast(
        spark.createDataFrame(offsets, "__shard int, __off bigint")
    )
    return (
        local.join(off_df, "__shard")
        .withColumn(out_col, F.col(out_col) + F.col("__off"))
        .drop("__shard", "__off")
    )
