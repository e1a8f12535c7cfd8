"""Round-9 intent tests: the top-level /search convenience params
(`intersects`, `ids`), the exact polygon-vs-rect predicate they ride
on, and the hot-key reshape primitives (per-key partitioned
row_number)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def items(spark, sf_dir):
    from recipes_spark.plans.items import build_items
    from recipes_spark.queries.stac import _metadata

    return build_items(_metadata(spark, sf_dir)).localCheckpoint(eager=True)


def test_intersects_strictly_refines_bbox(spark, items):
    """The query triangle's envelope corners lie OUTSIDE the triangle:
    a bbox= search over the envelope must keep strictly more items
    than intersects= with the triangle, and the triangle's matches
    must be a subset — intersects is exact geometry, not a bbox
    alias."""
    from recipes_spark.plans.catalog import catalog_search
    from recipes_spark.queries.stac import _SEARCH_TRIANGLE

    tri = {
        r["id"]
        for r in catalog_search(items, intersects=_SEARCH_TRIANGLE)
        .select("id")
        .collect()
    }
    env = {
        r["id"]
        for r in catalog_search(items, bbox=(-120.0, -60.0, 120.0, 60.0))
        .select("id")
        .collect()
    }
    assert tri < env, (len(tri), len(env))


def test_polygon_bbox_intersects_known_cases(spark):
    """Hand-checkable fixtures for every decomposition branch of
    polygon_bbox_intersects: edge-crossing, rect-inside-polygon,
    polygon-inside-rect, disjoint-but-envelope-overlapping (the corner
    a bbox test gets wrong), a hole swallowing the rect (even-odd),
    and a MultiPolygon part hit."""
    from recipes_spark.plans.catalog import polygon_bbox_intersects

    tri = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (0.0, 0.0)]
    donut = {
        "type": "Polygon",
        "coordinates": [
            [(0.0, 0.0), (20.0, 0.0), (20.0, 20.0), (0.0, 20.0), (0.0, 0.0)],
            [(5.0, 5.0), (15.0, 5.0), (15.0, 15.0), (5.0, 15.0), (5.0, 5.0)],
        ],
    }
    multi = {
        "type": "MultiPolygon",
        "coordinates": [
            [[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]],
            [[(50.0, 50.0), (60.0, 50.0), (60.0, 60.0), (50.0, 60.0),
              (50.0, 50.0)]],
        ],
    }
    cases = [
        # (geometry, rect (w,s,e,n), expected)
        (tri, (7.0, 7.0, 9.0, 9.0), False),   # envelope hits, triangle misses
        (tri, (1.0, 1.0, 2.0, 2.0), True),    # rect inside triangle
        (tri, (-5.0, -5.0, 15.0, 15.0), True),  # triangle inside rect
        (tri, (-1.0, -1.0, 1.0, 1.0), True),  # edge crossing
        (tri, (11.0, 11.0, 12.0, 12.0), False),  # fully disjoint
        (donut, (8.0, 8.0, 12.0, 12.0), False),  # rect inside the hole
        (donut, (1.0, 1.0, 3.0, 3.0), True),     # rect in the ring
        (donut, (8.0, 8.0, 16.0, 12.0), True),   # rect spans hole edge
        (multi, (55.0, 55.0, 58.0, 58.0), True),  # second part hit
        (multi, (10.0, 10.0, 20.0, 20.0), False),  # between parts
    ]
    df = spark.createDataFrame(
        [(i, w, s, e, n) for i, (_, (w, s, e, n), _) in enumerate(cases)],
        "i int, w double, s double, e double, n double",
    )
    preds = [
        F.when(
            F.col("i") == i,
            polygon_bbox_intersects(
                geom, F.col("w"), F.col("s"), F.col("e"), F.col("n")
            ),
        )
        for i, (geom, _, _) in enumerate(cases)
    ]
    got = {
        r["i"]: r["hit"]
        for r in df.select(
            "i", F.coalesce(*preds).alias("hit")
        ).collect()
    }
    for i, (_, rect, want) in enumerate(cases):
        assert got[i] == want, (i, rect, want)


def test_ids_and_intersects_compose_with_paging_and_fields(spark, items):
    """The convenience params flow through the same catalog_search
    pipeline as everything else: keyset paging over an intersects=
    search walks the exact same row set one TakeOrderedAndProject at a
    time, and fields= projection applies after the cursor extraction."""
    from recipes_spark.plans.catalog import catalog_search, search_pages
    from recipes_spark.queries.stac import _SEARCH_TRIANGLE

    whole = [
        r["id"]
        for r in catalog_search(
            items, intersects=_SEARCH_TRIANGLE, sortby=[("id", "asc")],
            limit=120,
        ).select("id").collect()
    ]
    paged = []
    for page in search_pages(
        items,
        page_size=50,
        sortby=[("id", "asc")],
        intersects=_SEARCH_TRIANGLE,
        fields=["id"],
        max_pages=3,
    ):
        assert set(page.columns) == {"id", "collection_id"}
        paged.extend(r["id"] for r in page.collect())
        if len(paged) >= 120:
            break
    assert paged[:120] == whole


def test_per_key_row_number_matches_window(spark, sf_dir):
    """partitioned_row_number(partition_by=...) must equal the naive
    per-key row_number window on the same total order — at 3 AND 32
    shards, so shard-boundary placement provably cancels."""
    from recipes_spark.io import load
    from recipes_spark.operators.prefix import partitioned_row_number
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.col("event_id").cast("long").alias("eid"),
    )
    w = Window.partitionBy("event_type").orderBy("us", "eid")
    want = {
        (r["event_type"], r["eid"]): r["rn"]
        for r in ev.withColumn(
            "rn", F.row_number().over(w).cast("long")
        ).collect()
    }
    for shards in (3, 32):
        out, total = partitioned_row_number(
            ev,
            order_exprs=[F.col("us"), F.col("eid")],
            partition_by=["event_type"],
            shards=shards,
        )
        got = {
            (r["event_type"], r["eid"]): r["rn"] for r in out.collect()
        }
        assert got == want, shards
        assert total == len(want)


def test_per_key_row_number_skips_total_job(spark, sf_dir):
    """with_total=False returns -1 without running the count job (the
    contract agg_spearman relies on at plan-construction time)."""
    from recipes_spark.io import load
    from recipes_spark.operators.prefix import partitioned_row_number

    ev = load(spark, sf_dir, "events").select(
        "event_type", F.col("event_id").cast("long").alias("eid")
    )
    out, total = partitioned_row_number(
        ev,
        order_exprs=[F.col("eid")],
        partition_by=["event_type"],
        with_total=False,
    )
    assert total == -1
    assert out.limit(1).count() == 1


def test_hydration_round_trip_all_branches(spark):
    """hydrate(dehydrate(x)) == x on a hand-built frame covering every
    merge branch: equal-to-base, differs-from-base, explicit NULL with
    a non-null base (the DO_NOT_MERGE sentinel), NULL with a NULL base
    (whole collection lacks the field), and a single-item
    collection."""
    from recipes_spark.plans.hydrate import (
        DO_NOT_MERGE,
        base_items,
        dehydrate_items,
        hydrate_items,
    )

    rows = [
        ("a", "c1", "x"),
        ("b", "c1", "x"),
        ("c", "c1", "y"),      # differs from base
        ("d", "c1", None),     # explicit null, base exists → sentinel
        ("e", "c2", None),     # whole collection null → base null
        ("f", "c2", None),
        ("g", "c3", "solo"),   # single-item collection
    ]
    df = spark.createDataFrame(rows, "id string, collection_id string, v string")
    base = base_items(df, ["v"])
    got_base = {r["collection_id"]: r["base_v"] for r in base.collect()}
    assert got_base == {"c1": "x", "c2": None, "c3": "solo"}

    deh = dehydrate_items(df, base, ["v"])
    got_deh = {r["id"]: r["v"] for r in deh.collect()}
    assert got_deh == {
        "a": None, "b": None, "c": "y", "d": DO_NOT_MERGE,
        "e": None, "f": None, "g": None,
    }

    hyd = hydrate_items(deh, base, ["v"])
    assert {(r["id"], r["collection_id"], r["v"]) for r in hyd.collect()} == set(rows)


def test_base_item_tiebreak_is_deterministic(spark):
    """Modal-value ties break to the SMALLER value — re-derivation on
    differently-partitioned input cannot flap the base item."""
    from recipes_spark.plans.hydrate import base_items

    rows = [("i%d" % i, "c", v) for i, v in enumerate(["b", "b", "a", "a"])]
    df = spark.createDataFrame(rows, "id string, collection_id string, v string")
    for parts in (1, 7):
        got = base_items(df.repartition(parts), ["v"]).collect()
        assert [(r["collection_id"], r["base_v"]) for r in got] == [("c", "a")]


def test_cql_polygon_intersects_is_exact(spark, items):
    """CQL2 S_INTERSECTS with a POLYGON now compiles to the SAME exact
    Column tree as the top-level intersects= param (both encodings) —
    the text filter, the JSON filter and the convenience param must
    return the identical id set on a triangle that differs from its
    own envelope, and S_DISJOINT must be its exact complement."""
    from recipes_spark.plans.catalog import catalog_search
    from recipes_spark.plans.cql import compile_cql, compile_cql_json
    from recipes_spark.queries.stac import _SEARCH_TRIANGLE

    def ids(df):
        return {r["id"] for r in df.select("id").collect()}

    via_param = ids(catalog_search(items, intersects=_SEARCH_TRIANGLE))
    tri_txt = (
        "S_INTERSECTS(geometry, "
        "POLYGON((-120 -60, 0 60, 120 -60, -120 -60)))"
    )
    via_text = ids(catalog_search(items, filter=compile_cql(tri_txt)))
    via_json = ids(
        catalog_search(
            items,
            filter=compile_cql_json(
                {
                    "op": "s_intersects",
                    "args": [
                        {"property": "geometry"},
                        {
                            "type": "Polygon",
                            "coordinates": _SEARCH_TRIANGLE["coordinates"],
                        },
                    ],
                }
            ),
        )
    )
    assert via_text == via_param
    assert via_json == via_param
    disjoint = ids(
        catalog_search(
            items,
            filter=compile_cql(tri_txt.replace("S_INTERSECTS", "S_DISJOINT")),
        )
    )
    every = ids(items)
    assert via_param | disjoint == every
    assert not (via_param & disjoint)
    # and the triangle genuinely differs from its envelope
    env = ids(catalog_search(items, bbox=(-120.0, -60.0, 120.0, 60.0)))
    assert via_param < env


def test_cql_rectangle_polygon_unchanged(spark, items):
    """A RECTANGULAR polygon's exact test must equal the envelope test
    (the reduction that keeps every previously-attested rectangle
    filter, e.g. stac_cql_spatial's, byte-identical)."""
    from recipes_spark.plans.catalog import catalog_search
    from recipes_spark.plans.cql import compile_cql

    def ids(df):
        return {r["id"] for r in df.select("id").collect()}

    rect = compile_cql(
        "S_INTERSECTS(geometry, "
        "POLYGON((-50 -40, 60 -40, 60 40, -50 40, -50 -40)))"
    )
    assert ids(catalog_search(items, filter=rect)) == ids(
        catalog_search(items, bbox=(-50.0, -40.0, 60.0, 40.0))
    )
