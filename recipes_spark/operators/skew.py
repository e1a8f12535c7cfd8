"""Skew-resilient join via key salting (SURVEY.md §2 scale notes /
100 TB design).

AQE's skew-join splitter handles sort-merge skew automatically, but two
cases still need explicit salting at 100 TB: (a) broadcast-ineligible
dim joins where ONE hot key dominates (power-law user_id/collection_id
distributions), and (b) aggregations onto a hot key. The trick:

    fact:  salt = pmod(hash(row-unique), S)   → key stays, adds salt col
    dim:   explode to S copies, one per salt value

The join key becomes (key, salt): the hot key's rows spread over S
partitions instead of one straggler task. Cost: the dim side inflates
S× — bounded, because you only salt joins whose dim side is small
enough to replicate (that's exactly the broadcast-ineligible-but-modest
regime where salting beats both plain shuffle and broadcast).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    *,
    fact_key: str,
    dim_key: str,
    salt: int = 8,
    how: str = "inner",
    unique_col: str | None = None,
) -> DataFrame:
    """Equi-join fact⋈dim on fact_key==dim_key with the fact side's hot
    keys spread across `salt` sub-partitions. `unique_col` (any column
    that varies within a key, e.g. the fact's id) seeds the salt; falls
    back to a nondeterministic uniform salt when omitted.

    Only inner/left are supported: the dim side is exploded into `salt`
    copies, so right/full outer would emit every unmatched dim row once
    per salt value (duplicates)."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only, got {how!r}: "
            "outer joins would duplicate unmatched dim rows salt times"
        )
    if unique_col is not None:
        salt_col = F.pmod(F.xxhash64(F.col(unique_col)), F.lit(salt))
    else:
        salt_col = (F.rand() * salt).cast("int")
    f = fact.withColumn("__salt", salt_col)
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = f.join(
        d, (f[fact_key] == d[dim_key]) & (f["__salt"] == d["__salt"]), how
    )
    return out.drop("__salt")


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: Sequence[tuple[str, str, str]],
    *,
    salt: int = 8,
    unique_col: str,
) -> DataFrame:
    """Two-phase aggregation for a skewed group key: partial aggregate
    on (key, salt), then final on key. Only sum/count/min/max compose
    (avg = sum/count at the call site). aggs = [(fn, col, alias)]."""
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn, _, _ in aggs:
        if fn not in recombine:
            raise ValueError(f"unsupported agg for salting: {fn}")
    partial = (
        df.withColumn("__salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(salt)))
        .groupBy(key, "__salt")
        .agg(*[first[fn](c).alias(a) for fn, c, a in aggs])
    )
    return partial.groupBy(key).agg(
        *[recombine[fn](a).alias(a) for fn, _, a in aggs]
    )


def salted_windowed_agg(
    df: DataFrame,
    *,
    time_col: str,
    window_duration: str,
    key: str,
    aggs: Sequence[tuple[str, str, str]],
    salt: int = 8,
    unique_col: str,
) -> DataFrame:
    """Two-phase TIME-WINDOWED aggregation for a skewed key: partial on
    (key, window, salt), final on (key, window) — the salted_agg shape
    with a tumbling `F.window` added to both group-bys.

    This is the hot-key fix for windowed rollups (one device/user
    producing most events in every window): a plain
    groupBy(key, window) funnels the hot key's rows per window through
    one reducer task; salting spreads them over `salt` sub-partitions,
    then recombines the (tiny) per-salt partials. Output columns:
    key, window_start, window_end, *aliases. Same composability rule
    as salted_agg (sum/count/min/max)."""
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn, _, _ in aggs:
        if fn not in recombine:
            raise ValueError(f"unsupported agg for salting: {fn}")
    win = F.window(F.col(time_col), window_duration)
    partial = (
        df.withColumn("__salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(salt)))
        .groupBy(F.col(key), win.alias("__w"), F.col("__salt"))
        .agg(*[first[fn](c).alias(a) for fn, c, a in aggs])
    )
    return (
        partial.groupBy(key, "__w")
        .agg(*[recombine[fn](a).alias(a) for fn, _, a in aggs])
        .select(
            key,
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            *[a for _, _, a in aggs],
        )
    )
