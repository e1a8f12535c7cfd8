"""Round-10 intent tests: the single-pass base_items melt, the
DO_NOT_MERGE collision guard, and the CQL2-JSON MultiPolygon parity
live where a plan-shape diff alone can't prove behavior."""

from __future__ import annotations

import pytest


def test_base_items_single_pass_multi_field(spark):
    """base_items melts ALL fields into one long-form count — the
    per-field modal values and NULL-when-absent behavior must be
    identical to the per-field round-9 derivation, including a field
    that is null for a whole collection while another field isn't."""
    from recipes_spark.plans.hydrate import base_items

    rows = [
        ("a", "c1", "x", "p1"),
        ("b", "c1", "x", None),
        ("c", "c1", "y", None),
        ("d", "c2", None, "p2"),
        ("e", "c2", None, "p2"),
    ]
    df = spark.createDataFrame(
        rows, "id string, collection_id string, v string, plat string"
    )
    got = {
        r["collection_id"]: (r["base_v"], r["base_plat"])
        for r in base_items(df, ["v", "plat"]).collect()
    }
    assert got == {"c1": ("x", "p1"), "c2": (None, "p2")}


def test_base_items_is_one_item_scan(spark):
    """The melt's whole point: exactly ONE scan of the item relation
    feeds the count aggregate regardless of field count. The item
    frame appears once in the long-form plan (plus the bounded
    collection-id distinct), never once per field."""
    from recipes_spark.plans.hydrate import base_items

    df = spark.createDataFrame(
        [("a", "c1", "x", "y", "z")],
        "id string, collection_id string, f1 string, f2 string, f3 string",
    )
    plan = (
        base_items(df, ["f1", "f2", "f3"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # One explode (the melt) — the round-9 shape had zero explodes and
    # F per-field aggregates instead; F>1 explodes would mean the melt
    # itself re-scans.
    assert plan.count("explode") == 1, plan


def test_dehydrate_raises_on_sentinel_source_value(spark):
    """ADVICE r9: a source value equal to the DO_NOT_MERGE sentinel
    would survive dehydrate verbatim and hydrate back to NULL — the
    engine must fail closed instead of corrupting the round-trip."""
    from recipes_spark.plans.hydrate import (
        DO_NOT_MERGE,
        base_items,
        dehydrate_items,
    )

    df = spark.createDataFrame(
        [("a", "c1", "x"), ("b", "c1", DO_NOT_MERGE)],
        "id string, collection_id string, v string",
    )
    base = base_items(df, ["v"])
    with pytest.raises(Exception, match="DO_NOT_MERGE"):
        dehydrate_items(df, base, ["v"]).collect()
