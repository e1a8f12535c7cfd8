"""P3: cast-with-error-context → quarantine split (SURVEY.md §2.2).

The reference float-casts attr strings and re-raises with the offending
values attached (insitu…/recipe.py:87-90) — fail-the-pipeline
semantics. At 100 TB one malformed file must not kill a million-file
job, so the engine's form is try_cast + a REJECT TABLE: good rows flow
on typed, bad rows land in a quarantine DataFrame carrying the original
value and a reason — the same diagnostic context, without the abort.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def cast_split(
    df: DataFrame,
    casts: Sequence[tuple[str, str]],
    *,
    keep: Sequence[str] = (),
) -> tuple[DataFrame, DataFrame]:
    """Apply (column, target_type) try_casts. Returns (good, rejects):
    good = rows where every cast succeeded (or source was NULL), with
    the cast columns REPLACED by their typed values; rejects = one row
    per failed (row, column) with the raw value and a reason string."""
    fail_preds = []
    reject_parts = []
    for col, typ in casts:
        cast = F.col(col).try_cast(typ)
        failed = F.col(col).isNotNull() & cast.isNull()
        fail_preds.append(failed)
        reject_parts.append(
            df.filter(failed).select(
                *keep,
                F.lit(col).alias("bad_column"),
                F.col(col).cast("string").alias("bad_value"),
                F.lit(f"not castable to {typ}").alias("reason"),
            )
        )
    any_failed = fail_preds[0]
    for p in fail_preds[1:]:
        any_failed = any_failed | p
    # Filter on the ORIGINAL columns first, cast after — replacing a
    # column before filtering would evaluate the failure predicate
    # against the already-cast value (always "success").
    good = df.filter(~any_failed)
    for col, typ in casts:
        good = good.withColumn(col, F.col(col).try_cast(typ))
    rejects = reject_parts[0]
    for part in reject_parts[1:]:
        rejects = rejects.unionByName(part)
    return good, rejects
