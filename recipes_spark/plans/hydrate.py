"""pgstac-style item dehydration/hydration (SURVEY.md §3.3 parity:
the reference runs stac-fastapi with USE_API_HYDRATE,
docker-compose.yml:22 — pgstac stores each item as a DELTA against its
collection's BASE ITEM and re-hydrates at read time).

The engine's columnar store makes the byte-savings argument mostly
moot (a constant column run-length-encodes to nothing in parquet), so
this exists for BEHAVIORAL parity: the same three-way merge pgstac
performs, over string item fields.

Semantics (mirroring pgstac's content_hydrate/content_dehydrate):
- base item  = per collection, per field, the modal value among items
  (deterministic tiebreak: higher count, then smaller value);
- dehydrate  = field equal to the base value → stored NULL;
  field NULL where the base has a value → stored DO_NOT_MERGE token
  (pgstac's magic string — "this key is explicitly absent, do not
  inherit"); anything else stored verbatim;
- hydrate    = token → NULL; NULL → base value; else the stored value.

hydrate(dehydrate(items)) == items for every case, including
explicit-null fields — the round-trip is oracled in
queries/stac.py::stac_item_hydration and property-tested in
tests/test_intent_round9.py. The one value the identity CANNOT cover
is a source field equal to the sentinel itself; dehydrate_items
raises on it rather than corrupt silently (ADVICE r9).

Scale: the base derivation is one count aggregate over (collection,
field value) — distinct-value-sized — plus a window over THAT table;
dehydrate/hydrate are broadcast joins of the collections-sized base
dim against the item stream. No shuffle of item rows anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

#: Magic "do not merge" marker (pgstac's hydration uses an equally
#: improbable cuneiform marker string) — stored where an item
#: EXPLICITLY lacks a field its collection base provides, so hydration
#: restores NULL instead of inheriting the base value.
DO_NOT_MERGE = "𒍟※"


def base_items(items: DataFrame, fields: Sequence[str]) -> DataFrame:
    """Derive the per-collection base item: for each field, the modal
    non-null value with a deterministic (count DESC, value ASC)
    tiebreak. Output: one row per collection_id with ``base_<field>``
    columns (NULL when a collection has no non-null value at all).

    ONE pass over the item table: every field melts into a
    (collection_id, field, value) long row (row-local explode of a
    literal-keyed map), one count aggregate over the long form, the
    modal pick as a window over THAT distinct-value-sized table, and a
    pivot back to one row per collection. The round-9 shape ran one
    groupBy-count per field — F fields = F scans; this is the same
    distinct-value-sized shuffle volume in a single scan. The pivot
    keys on the compile-time field list (no extra distinct job).

    Typing contract (ADVICE r10): the melt canonicalizes every field
    to its Spark string form, so each ``base_<f>`` is cast BACK to the
    source field's type on the way out — output types match the
    round-9 per-field derivation. The modal COUNT is type-independent;
    only the count-tie tiebreak differs for non-string fields
    (lexicographic on the canonical string form, e.g. '10' < '9',
    rather than numeric). pgstac's hydration fields are strings, where
    the two orders coincide; callers passing numeric fields get a
    deterministic — just lexicographic — tie pick. The contract covers
    ATOMIC types only: a complex-typed field (array/struct/map) cannot
    round-trip through the string melt (string→complex cast is
    unsupported in Spark and would fail at analysis time deep inside
    the pivot) — rejected up front with a clear error (ADVICE r11)."""
    dtypes = dict(items.dtypes)
    complex_fields = [
        f
        for f in fields
        if dtypes[f].startswith(("array<", "struct<", "map<"))
    ]
    if complex_fields:
        raise ValueError(
            "base_items: only atomic-typed fields are supported (the "
            "melt canonicalizes through a string cast, and Spark cannot "
            "cast a string back to a complex type); got complex-typed "
            f"field(s): {complex_fields}"
        )
    long = items.select(
        "collection_id",
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(f) for f in fields]),
                F.array(*[F.col(f).cast("string") for f in fields]),
            )
        ).alias("__field", "__value"),
    ).filter(F.col("__value").isNotNull())
    counts = long.groupBy("collection_id", "__field", "__value").agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = Window.partitionBy("collection_id", "__field").orderBy(
        F.col("__c").desc(), F.col("__value").asc()
    )
    best = (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .groupBy("collection_id")
        .pivot("__field", list(fields))
        .agg(F.first("__value"))
    )
    return items.select("collection_id").distinct().join(
        best.select(
            "collection_id",
            *[
                F.col(f).cast(dtypes[f]).alias(f"base_{f}")
                for f in fields
            ],
        ),
        "collection_id",
        "left",
    )


def dehydrate_items(
    items: DataFrame, base: DataFrame, fields: Sequence[str]
) -> DataFrame:
    """Strip each listed field down to its delta against the collection
    base: equal-to-base (null-safe) → NULL; explicitly-null where the
    base has a value → DO_NOT_MERGE; else kept verbatim. The base dim
    is broadcast — item rows never shuffle.

    A SOURCE value equal to the DO_NOT_MERGE sentinel raises at
    execution time (fail-closed): stored verbatim it would hydrate
    back to NULL, silently breaking the hydrate(dehydrate(x)) == x
    identity this module advertises — and pgstac has the same
    collision, it just never checks. One extra string compare per
    field per row."""
    out = items.join(F.broadcast(base), "collection_id", "left")
    for f in fields:
        b = F.col(f"base_{f}")
        out = out.withColumn(
            f,
            F.when(
                F.col(f) == F.lit(DO_NOT_MERGE),
                F.raise_error(
                    F.lit(
                        f"dehydrate_items: field {f!r} contains the "
                        "DO_NOT_MERGE sentinel as a source value — the "
                        "round-trip identity cannot hold; escape or drop "
                        "the row upstream"
                    )
                ).cast("string"),
            )
            .when(F.col(f).eqNullSafe(b), F.lit(None).cast("string"))
            .when(F.col(f).isNull() & b.isNotNull(), F.lit(DO_NOT_MERGE))
            .otherwise(F.col(f)),
        )
    return out.drop(*[f"base_{f}" for f in fields])


def hydrate_items(
    dehydrated: DataFrame, base: DataFrame, fields: Sequence[str]
) -> DataFrame:
    """Invert dehydrate_items: token → NULL, NULL → base value, else
    the stored delta. Same broadcast shape."""
    out = dehydrated.join(F.broadcast(base), "collection_id", "left")
    for f in fields:
        out = out.withColumn(
            f,
            F.when(F.col(f) == DO_NOT_MERGE, F.lit(None).cast("string"))
            .otherwise(F.coalesce(F.col(f), F.col(f"base_{f}"))),
        )
    return out.drop(*[f"base_{f}" for f in fields])
