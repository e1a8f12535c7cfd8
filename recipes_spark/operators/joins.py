"""Join operators Spark lacks natively (SURVEY.md §2.3 J5–J8).

As-of join: Spark has no MERGE ASOF. The naive encoding — theta join on
``r.ts <= l.ts`` + row_number — multiplies rows before filtering (O(n·m)
per key) and dies at scale. We instead use the union+window plan:

    tag left/right → unionByName → window(partitionBy=key,
    orderBy=(ts, side)) → last(right_value, ignorenulls=True)

which costs ONE shuffle on the key and ONE sort per partition —
O((n+m) log(n+m)) total, no row blowup, and AQE handles key skew. This is
the standard point-in-time-join formulation used by large-scale feature
stores.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str,
    right_ts: str,
    by: str | Sequence[str],
    value_cols: Sequence[str],
    direction: str = "backward",
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the value columns of the right row with
    the greatest ``right_ts <= left_ts`` (direction='backward'; 'forward'
    = least ``right_ts >= left_ts``) within the same ``by`` key(s).

    Left rows with no match keep NULL value columns (left-asof
    semantics). ``value_cols`` are the right-side columns to carry; they
    must not collide with left column names (alias beforehand).

    ``tiebreak`` names a right-side column that breaks ties when several
    right rows share the same (key, right_ts): the row with the GREATEST
    tiebreak value wins (both directions). Without it the winner among
    tied rows is partition-order-dependent — fine for idempotent values,
    nondeterministic otherwise.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    keys = [by] if isinstance(by, str) else list(by)

    # Tag sides: right rows sort before left at equal ts for 'backward'
    # (so an exactly-simultaneous right row IS visible to the left row).
    left_cols = [c for c in left.columns]
    tb_type = right.schema[tiebreak].dataType if tiebreak else None
    l_tagged = left.select(
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *([F.lit(None).cast(tb_type).alias("__tb")] if tiebreak else []),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *([F.col(tiebreak).alias("__tb")] if tiebreak else []),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)

    # Last key __tb asc: within rows tied on (__ts, __side), last()
    # picks the row with the max tiebreak — deterministic both ways.
    order = [
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc(),
        F.col("__side").asc(),
    ]
    if tiebreak:
        order.append(F.col("__tb").asc_nulls_first())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *unioned.columns,
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in value_cols
        ],
    )

    return filled.filter(F.col("__side") == 1).select(
        *left_cols,
        *[F.col(f"__f_{c}").alias(c) for c in value_cols],
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    *,
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_width_seconds: int,
    extra_cond=None,
) -> DataFrame:
    """Point-in-interval join without an equi key: bucketize time so the
    join has an equi component (bucket id) and the range predicate only
    filters within-bucket candidates. Intervals are exploded into every
    bucket they overlap; width should be ≥ the typical interval length
    so the explosion factor stays near 1.

    This is the scale path for pure range joins — a raw theta join is a
    broadcast-nested-loop in Spark, O(n·m).
    """
    w = bucket_width_seconds
    lb = left.withColumn(
        "__bucket", (F.unix_timestamp(F.col(left_point)) / w).cast("long")
    )
    rb = right.withColumn(
        "__buckets",
        F.sequence(
            (F.unix_timestamp(F.col(right_start)) / w).cast("long"),
            (F.unix_timestamp(F.col(right_end)) / w).cast("long"),
        ),
    ).withColumn("__bucket", F.explode("__buckets")).drop("__buckets")
    cond = (
        (lb["__bucket"] == rb["__bucket"])
        & (F.col(left_point) >= F.col(right_start))
        & (F.col(left_point) <= F.col(right_end))
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return lb.join(rb, cond).drop("__bucket")
