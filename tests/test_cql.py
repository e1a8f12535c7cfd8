"""CQL2-text compiler: parse → Column equivalence against hand-built
predicates, on the events/documents tables."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from recipes_spark.io import load
from recipes_spark.plans.cql import CQLError, compile_cql


def _count(df, pred):
    return df.filter(pred).count()


@pytest.fixture(scope="module")
def ev(spark, sf_dir):
    return load(spark, sf_dir, "events").cache()


def test_comparisons(ev):
    assert _count(ev, compile_cql("value > 50")) == _count(
        ev, F.col("value") > 50
    )
    assert _count(ev, compile_cql("event_type = 'click'")) == _count(
        ev, F.col("event_type") == "click"
    )
    assert _count(ev, compile_cql("event_type <> 'click'")) == _count(
        ev, F.col("event_type") != "click"
    )


def test_boolean_structure_and_precedence(ev):
    got = compile_cql(
        "event_type = 'click' OR event_type = 'view' AND value >= 90"
    )
    want = (F.col("event_type") == "click") | (
        (F.col("event_type") == "view") & (F.col("value") >= 90)
    )
    assert _count(ev, got) == _count(ev, want)
    got2 = compile_cql(
        "(event_type = 'click' OR event_type = 'view') AND NOT value < 10"
    )
    want2 = ((F.col("event_type") == "click") | (F.col("event_type") == "view")) & ~(
        F.col("value") < 10
    )
    assert _count(ev, got2) == _count(ev, want2)


def test_between_in_like_null(ev):
    assert _count(ev, compile_cql("value BETWEEN 20 AND 30")) == _count(
        ev, F.col("value").between(20, 30)
    )
    assert _count(
        ev, compile_cql("event_type IN ('click', 'view', 'error')")
    ) == _count(ev, F.col("event_type").isin("click", "view", "error"))
    assert _count(ev, compile_cql("event_type LIKE 'c%'")) == _count(
        ev, F.col("event_type").like("c%")
    )
    assert _count(ev, compile_cql("event_type IS NOT NULL")) == ev.count()
    assert _count(ev, compile_cql("event_type NOT IN ('click')")) == _count(
        ev, ~F.col("event_type").isin("click")
    )


def test_timestamp_literal(ev):
    got = compile_cql("ts >= TIMESTAMP('2024-01-15 00:00:00')")
    want = F.col("ts") >= F.lit("2024-01-15 00:00:00").cast("timestamp")
    assert _count(ev, got) == _count(ev, want)


def test_string_escaping(spark):
    df = spark.createDataFrame([("it's",), ("plain",)], "s string")
    # CQL doubles quotes inside strings: 'it''s' means it's.
    assert df.filter(compile_cql("s = 'it''s'")).count() == 1


@pytest.fixture(scope="module")
def geo(spark):
    df = spark.createDataFrame(
        [
            (1, -10.0, -5.0, 10.0, 5.0, "2020-03-01", "2020-03-05", "Col-A"),
            (2, 100.0, 40.0, 120.0, 60.0, "2021-01-01", "2021-02-01", "col-b"),
            (3, -170.0, -80.0, -150.0, -60.0, "2019-06-01", "2019-06-02", "COL-A"),
        ],
        "id long, west double, south double, east double, north double,"
        " s string, e string, coll string",
    )
    return (
        df.withColumn("start_datetime", F.col("s").cast("timestamp"))
        .withColumn("end_datetime", F.col("e").cast("timestamp"))
        .cache()
    )


_SC = ("west", "south", "east", "north")


def _ids(df, pred):
    return [r.id for r in df.filter(pred).select("id").orderBy("id").collect()]


def test_s_intersects_geometries(geo):
    assert _ids(geo, compile_cql(
        "S_INTERSECTS(geometry, BBOX(-20, -10, 0, 0))", spatial_cols=_SC
    )) == [1]
    # Polygon → envelope; matches the box item fully inside it.
    assert _ids(geo, compile_cql(
        "S_INTERSECTS(geometry, POLYGON((90 30, 130 30, 130 70, 90 70, 90 30)))",
        spatial_cols=_SC,
    )) == [2]
    assert _ids(geo, compile_cql(
        "S_INTERSECTS(geometry, POINT(0 0))", spatial_cols=_SC
    )) == [1]
    # Hand-built G3 equivalence on the whole table.
    from recipes_spark.plans.catalog import bbox_intersects

    got = compile_cql(
        "S_INTERSECTS(geometry, BBOX(-180, -90, 0, 0))", spatial_cols=_SC
    )
    want = bbox_intersects(
        F.col("west"), F.col("south"), F.col("east"), F.col("north"),
        -180.0, -90.0, 0.0, 0.0,
    )
    assert _ids(geo, got) == _ids(geo, want)


def test_s_intersects_default_bbox_array(spark):
    # Default spatial_cols = the build_items item shape (bbox array).
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 10.0, 10.0]), (2, [50.0, 50.0, 60.0, 60.0])],
        "id long, bbox array<double>",
    )
    pred = compile_cql("S_INTERSECTS(geometry, BBOX(5, 5, 20, 20))")
    assert [r.id for r in df.filter(pred).collect()] == [1]


def test_temporal_operators(geo):
    assert _ids(geo, compile_cql(
        "T_INTERSECTS(datetime, "
        "INTERVAL('2020-02-01 00:00:00', '2020-03-02 00:00:00'))"
    )) == [1]
    # ANYINTERACTS is an alias; '..' opens an end.
    assert _ids(geo, compile_cql(
        "ANYINTERACTS(datetime, INTERVAL('..', '2019-12-31 00:00:00'))"
    )) == [3]
    assert _ids(geo, compile_cql(
        "T_BEFORE(datetime, TIMESTAMP('2020-12-31 00:00:00'))"
    )) == [1, 3]
    assert _ids(geo, compile_cql(
        "T_AFTER(datetime, DATE('2020-12-31'))"
    )) == [2]
    # Instant = degenerate interval for T_INTERSECTS.
    assert _ids(geo, compile_cql(
        "T_INTERSECTS(datetime, TIMESTAMP('2020-03-03 00:00:00'))"
    )) == [1]


def test_casei(geo):
    assert _ids(geo, compile_cql("CASEI(coll) = 'col-a'")) == [1, 3]
    assert _ids(geo, compile_cql("CASEI(coll) = CASEI('COL-B')")) == [2]
    assert _ids(geo, compile_cql(
        "CASEI(coll) IN (CASEI('COL-A'), 'col-b')"
    )) == [1, 2, 3]


def test_spatial_relations(geo):
    """S_CONTAINS / S_WITHIN / S_DISJOINT over envelope footprints —
    exact for the engine's bbox geometries."""
    assert _ids(geo, compile_cql(
        "S_CONTAINS(geometry, BBOX(-5, -2, 5, 2))", spatial_cols=_SC
    )) == [1]
    assert _ids(geo, compile_cql(
        "S_WITHIN(geometry, BBOX(-20, -10, 20, 10))", spatial_cols=_SC
    )) == [1]
    assert _ids(geo, compile_cql(
        "S_DISJOINT(geometry, BBOX(-20, -10, 0, 0))", spatial_cols=_SC
    )) == [2, 3]
    # DISJOINT is exactly NOT INTERSECTS on every row.
    got_d = set(_ids(geo, compile_cql(
        "S_DISJOINT(geometry, BBOX(90, 30, 130, 70))", spatial_cols=_SC
    )))
    got_i = set(_ids(geo, compile_cql(
        "S_INTERSECTS(geometry, BBOX(90, 30, 130, 70))", spatial_cols=_SC
    )))
    assert got_d == {1, 2, 3} - got_i


def test_spatial_relations_antimeridian(geo):
    """A west>east query wraps: WITHIN matches an item inside EITHER
    longitude piece; CONTAINS needs an item covering BOTH (none here)."""
    assert _ids(geo, compile_cql(
        "S_WITHIN(geometry, BBOX(160, -90, -140, 90))", spatial_cols=_SC
    )) == [3]
    assert _ids(geo, compile_cql(
        "S_CONTAINS(geometry, BBOX(170, 0, -170, 10))", spatial_cols=_SC
    )) == []


def test_temporal_during_contains(geo):
    assert _ids(geo, compile_cql(
        "T_DURING(datetime, "
        "INTERVAL('2020-01-01 00:00:00', '2020-12-31 00:00:00'))"
    )) == [1]
    # Open end drops its bound: started any time in/after 2019.
    assert _ids(geo, compile_cql(
        "T_DURING(datetime, INTERVAL('2019-01-01 00:00:00', '..'))"
    )) == [1, 2, 3]
    assert _ids(geo, compile_cql(
        "T_CONTAINS(datetime, "
        "INTERVAL('2020-03-02 00:00:00', '2020-03-03 00:00:00'))"
    )) == [1]
    # Nothing finite contains an unbounded interval — loud, not empty.
    with pytest.raises(CQLError):
        compile_cql(
            "T_CONTAINS(datetime, INTERVAL('2020-01-01 00:00:00', '..'))"
        )


def test_accenti(spark):
    df = spark.createDataFrame(
        [(1, "café"), (2, "cafe"), (3, "CAFÉ"), (4, "tea")],
        "id long, name string",
    )

    def ids(pred):
        return [r.id for r in df.filter(pred).select("id").orderBy("id").collect()]

    assert ids(compile_cql("ACCENTI(name) = 'cafe'")) == [1, 2]
    # Accessors compose: case- AND accent-blind equality.
    assert ids(compile_cql("CASEI(ACCENTI(name)) = 'cafe'")) == [1, 2, 3]
    with pytest.raises(CQLError):
        compile_cql("ACCENTI(name")


def test_spatial_temporal_compose_with_property_filters(geo):
    got = compile_cql(
        "S_INTERSECTS(geometry, BBOX(-180, -90, 180, 90)) "
        "AND T_BEFORE(datetime, TIMESTAMP('2020-12-31 00:00:00')) "
        "AND NOT CASEI(coll) = 'col-b' AND id >= 1",
        spatial_cols=_SC,
    )
    assert _ids(geo, got) == [1, 3]


def test_spatial_temporal_errors(geo):
    for bad in (
        "S_INTERSECTS(geometry, CIRCLE(0 0 1))",
        "S_INTERSECTS(geometry BBOX(0, 0, 1, 1))",
        "T_BEFORE(datetime, INTERVAL('..', '2020-01-01 00:00:00'))",
        "T_AFTER(datetime, INTERVAL('2020-01-01 00:00:00', '..'))",
        "T_INTERSECTS(datetime, 5)",
        "CASEI(coll",
    ):
        with pytest.raises(CQLError):
            compile_cql(bad, spatial_cols=_SC)
    # Schemas without footprints reject the operators loudly.
    with pytest.raises(CQLError):
        compile_cql("S_INTERSECTS(geometry, BBOX(0, 0, 1, 1))", spatial_cols=None)
    with pytest.raises(CQLError):
        compile_cql(
            "T_AFTER(datetime, TIMESTAMP('2020-01-01 00:00:00'))",
            temporal_cols=None,
        )


def test_errors():
    for bad in ("value >", "AND value = 1", "value = 'unterminated",
                "value ! 3", "value = 1 extra"):
        with pytest.raises(CQLError):
            compile_cql(bad)


def test_cql_fuzz_controlled_errors():
    """Error-discipline fuzz: for ANY input text the compiler either
    returns a Column or raises CQLError — never an uncontrolled
    exception type (IndexError from token lookahead, RecursionError
    from deep nesting, etc.). A user-facing query compiler's crash
    class IS its API."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from recipes_spark.plans.cql import CQLError, compile_cql

    tokens = st.sampled_from(
        ["value", "=", "<", ">=", "AND", "OR", "NOT", "(", ")", "'x'",
         "1", "3.5", "BETWEEN", "IN", "LIKE", "IS", "NULL", ",",
         "T2024-01-01T00:00:00Z", "%", "'unterminated", "!", "  ",
         "S_INTERSECTS", "T_BEFORE", "ANYINTERACTS", "BBOX", "POLYGON",
         "POINT", "INTERVAL", "CASEI", "'..'", "-4"]
    )
    @settings(max_examples=400, deadline=None)
    @given(st.lists(tokens, max_size=14).map(" ".join))
    def fuzz(text):
        try:
            compile_cql(text)
        except CQLError:
            pass

    fuzz()

    # Deep nesting must not blow the recursion limit uncontrolled.
    deep = "(" * 2000 + "value = 1" + ")" * 2000
    try:
        compile_cql(deep)
    except CQLError:
        pass


# -- cql2-json (round 7): same predicate tree from the POST encoding ------


def _json_ids(df, obj, **kw):
    from recipes_spark.plans.cql import compile_cql_json

    return [
        r.id
        for r in df.filter(compile_cql_json(obj, **kw))
        .select("id").orderBy("id").collect()
    ]


def test_json_new_relations_match_text(geo):
    """The round-7 widening ops produce the same rows from both
    encodings: s_contains/s_within/s_disjoint, t_during/t_contains,
    accenti."""
    cases = [
        (
            {"op": "s_within", "args": [
                {"property": "geometry"},
                {"bbox": [-20.0, -10.0, 20.0, 10.0]},
            ]},
            "S_WITHIN(geometry, BBOX(-20, -10, 20, 10))",
        ),
        (
            {"op": "s_contains", "args": [
                {"property": "geometry"},
                {"bbox": [-5.0, -2.0, 5.0, 2.0]},
            ]},
            "S_CONTAINS(geometry, BBOX(-5, -2, 5, 2))",
        ),
        (
            {"op": "s_disjoint", "args": [
                {"property": "geometry"},
                {"bbox": [-20.0, -10.0, 0.0, 0.0]},
            ]},
            "S_DISJOINT(geometry, BBOX(-20, -10, 0, 0))",
        ),
        (
            {"op": "t_during", "args": [
                {"property": "datetime"},
                {"interval": ["2020-01-01 00:00:00", "2020-12-31 00:00:00"]},
            ]},
            "T_DURING(datetime, "
            "INTERVAL('2020-01-01 00:00:00', '2020-12-31 00:00:00'))",
        ),
        (
            {"op": "t_contains", "args": [
                {"property": "datetime"},
                {"interval": ["2020-03-02 00:00:00", "2020-03-03 00:00:00"]},
            ]},
            "T_CONTAINS(datetime, "
            "INTERVAL('2020-03-02 00:00:00', '2020-03-03 00:00:00'))",
        ),
        (
            {"op": "=", "args": [
                {"op": "accenti", "args": [{"op": "casei", "args": [
                    {"property": "coll"}]}]},
                "col-a",
            ]},
            "ACCENTI(CASEI(coll)) = 'col-a'",
        ),
    ]
    for obj, text in cases:
        assert _json_ids(geo, obj, spatial_cols=_SC) == _ids(
            geo, compile_cql(text, spatial_cols=_SC)
        ), text
    # t_contains open bound raises in the json encoding too.
    with pytest.raises(CQLError):
        from recipes_spark.plans.cql import compile_cql_json

        compile_cql_json(
            {"op": "t_contains", "args": [
                {"property": "datetime"},
                {"interval": ["2020-01-01 00:00:00", ".."]},
            ]}
        )


def test_json_comparisons_and_boolean(ev):
    from recipes_spark.plans.cql import compile_cql_json

    obj = {
        "op": "and",
        "args": [
            {"op": "or", "args": [
                {"op": "=", "args": [{"property": "event_type"}, "click"]},
                {"op": "=", "args": [{"property": "event_type"}, "view"]},
            ]},
            {"op": "not", "args": [
                {"op": "<", "args": [{"property": "value"}, 10]},
            ]},
        ],
    }
    want = (
        (F.col("event_type") == "click") | (F.col("event_type") == "view")
    ) & ~(F.col("value") < 10)
    assert _count(ev, compile_cql_json(obj)) == _count(ev, want)


def test_json_between_in_like_isnull(ev):
    from recipes_spark.plans.cql import compile_cql_json

    assert _count(ev, compile_cql_json(
        {"op": "between", "args": [{"property": "value"}, 20, 30]}
    )) == _count(ev, F.col("value").between(20, 30))
    assert _count(ev, compile_cql_json(
        {"op": "in", "args": [{"property": "event_type"}, ["click", "view"]]}
    )) == _count(ev, F.col("event_type").isin("click", "view"))
    assert _count(ev, compile_cql_json(
        {"op": "like", "args": [{"property": "event_type"}, "c%"]}
    )) == _count(ev, F.col("event_type").like("c%"))
    assert _count(ev, compile_cql_json(
        {"op": "not", "args": [
            {"op": "isNull", "args": [{"property": "event_type"}]}
        ]}
    )) == ev.count()


def test_json_matches_text_encoding(geo):
    """The SAME filter in both encodings compiles to the same rows —
    the pgstac dual-encoding guarantee."""
    from recipes_spark.plans.cql import compile_cql, compile_cql_json

    text = (
        "S_INTERSECTS(geometry, BBOX(-180, -90, 180, 90)) "
        "AND T_BEFORE(datetime, TIMESTAMP('2020-12-31 00:00:00')) "
        "AND NOT CASEI(coll) = 'col-b' AND id >= 1"
    )
    obj = {
        "op": "and",
        "args": [
            {"op": "s_intersects", "args": [
                {"property": "geometry"},
                {"bbox": [-180, -90, 180, 90]},
            ]},
            {"op": "t_before", "args": [
                {"property": "datetime"},
                {"timestamp": "2020-12-31 00:00:00"},
            ]},
            {"op": "not", "args": [
                {"op": "=", "args": [
                    {"op": "casei", "args": [{"property": "coll"}]}, "col-b",
                ]},
            ]},
            {"op": ">=", "args": [{"property": "id"}, 1]},
        ],
    }
    assert _ids(geo, compile_cql(text, spatial_cols=_SC)) == _json_ids(
        geo, obj, spatial_cols=_SC
    ) == [1, 3]


def test_json_geometries_and_intervals(geo):
    poly = {"op": "s_intersects", "args": [
        {"property": "geometry"},
        {"type": "Polygon",
         "coordinates": [[[90, 30], [130, 30], [130, 70], [90, 70], [90, 30]]]},
    ]}
    assert _json_ids(geo, poly, spatial_cols=_SC) == [2]
    point = {"op": "s_intersects", "args": [
        {"property": "geometry"}, {"type": "Point", "coordinates": [0, 0]},
    ]}
    assert _json_ids(geo, point, spatial_cols=_SC) == [1]
    open_iv = {"op": "anyinteracts", "args": [
        {"property": "datetime"},
        {"interval": ["..", "2019-12-31 00:00:00"]},
    ]}
    assert _json_ids(geo, open_iv) == [3]
    # JSON-string input works too.
    import json as _json

    assert _json_ids(geo, _json.dumps(open_iv)) == [3]


def test_json_multipolygon_intersects(geo):
    """ADVICE r9: the documented antimeridian workaround — split the
    wrapping polygon into a MultiPolygon at ±180 — must be expressible
    through the CQL2 JSON encoding, matching the top-level intersects=
    search param (which already accepts MultiPolygon)."""
    mp = {"op": "s_intersects", "args": [
        {"property": "geometry"},
        {"type": "MultiPolygon", "coordinates": [
            [[[160, -85], [180, -85], [180, -55], [160, -55], [160, -85]]],
            [[[-180, -85], [-140, -85], [-140, -55], [-180, -55],
              [-180, -85]]],
        ]},
    ]}
    # Item 3 (-170..-150 × -80..-60) sits in the western piece.
    assert _json_ids(geo, mp, spatial_cols=_SC) == [3]
    assert _json_ids(
        geo, {"op": "s_disjoint", "args": mp["args"]}, spatial_cols=_SC
    ) == [1, 2]
    # EXACT union, not the union's envelope: two triangles straddling
    # item 1's box — their joint envelope covers it, neither piece
    # touches it.
    tri = {"op": "s_intersects", "args": [
        {"property": "geometry"},
        {"type": "MultiPolygon", "coordinates": [
            [[[-30, -5], [-20, -5], [-25, 5], [-30, -5]]],
            [[[20, -5], [30, -5], [25, 5], [20, -5]]],
        ]},
    ]}
    assert _json_ids(geo, tri, spatial_cols=_SC) == []


def test_json_errors(geo):
    from recipes_spark.plans.cql import CQLError, compile_cql_json

    for bad in (
        {"op": "frobnicate", "args": []},
        {"op": "=", "args": [{"property": "id"}]},
        {"op": "in", "args": [{"property": "id"}, []]},
        {"op": "s_intersects", "args": [
            {"property": "geometry"}, {"type": "Circle", "coordinates": []},
        ]},
        {"op": "s_intersects", "args": [
            {"property": "geometry"},
            {"type": "MultiPolygon", "coordinates": [[]]},
        ]},
        {"op": "t_before", "args": [{"property": "datetime"}, 5]},
        {"no_op": 1},
        "not json at all {",
    ):
        with pytest.raises(CQLError):
            compile_cql_json(bad, spatial_cols=_SC)
    deep = {"op": "not", "args": []}
    for _ in range(500):
        deep = {"op": "not", "args": [deep]}
    with pytest.raises(CQLError):
        compile_cql_json(deep)


def test_date_instant_spans_whole_day(geo):
    """ADVICE r6: a DATE instant covers its full day — T_AFTER with
    DATE('2021-01-01') must NOT admit an item starting later that same
    day, and T_INTERSECTS with a DATE matches items overlapping any
    time within the day."""
    # Item 2 starts 2021-01-01 00:00:00 — not after the day 2021-01-01.
    assert _ids(geo, compile_cql("T_AFTER(datetime, DATE('2021-01-01'))")) == []
    # But it does intersect that day.
    assert _ids(geo, compile_cql(
        "T_INTERSECTS(datetime, DATE('2021-01-01'))"
    )) == [2]
    # Date-only upper interval bound widens to end of day.
    assert _ids(geo, compile_cql(
        "T_INTERSECTS(datetime, INTERVAL('2021-01-01', '2021-01-01'))"
    )) == [2]


def test_antimeridian_bbox_splits(geo):
    """ADVICE r6: west > east is an antimeridian crossing — compiles to
    the two wrapped ranges, so the Bering-strait box matches item 3
    (lon -170..-150) instead of nothing."""
    assert _ids(geo, compile_cql(
        "S_INTERSECTS(geometry, BBOX(160, -90, -140, 90))", spatial_cols=_SC
    )) == [3]
    # ...and does NOT match item 1 (lon -10..10, outside both ranges).
    assert 1 not in _ids(geo, compile_cql(
        "S_INTERSECTS(geometry, BBOX(160, -90, -140, 90))", spatial_cols=_SC
    ))


def test_bad_temporal_literals_fail_at_compile_time(geo):
    """ADVICE r6: unparseable instants raise CQLError at compile time
    instead of casting to NULL and silently filtering every row."""
    for bad in (
        "T_BEFORE(datetime, TIMESTAMP('not-a-time'))",
        "T_INTERSECTS(datetime, INTERVAL('2020-13-45', '..'))",
        "ts >= TIMESTAMP('2024-99-99 00:00:00')",
    ):
        with pytest.raises(CQLError):
            compile_cql(bad)


def test_sentinel_guard_accepts_column_tuple(geo):
    """ADVICE r6: passing real Column objects as spatial_cols must not
    crash on the sentinel equality check."""
    pred = compile_cql(
        "S_INTERSECTS(geometry, BBOX(-20, -10, 0, 0))",
        spatial_cols=(
            F.col("west"), F.col("south"), F.col("east"), F.col("north")
        ),
    )
    assert _ids(geo, pred) == [1]


def test_cql_json_fuzz_controlled_errors(spark):
    """Error-discipline fuzz for the JSON walker, mirroring the text
    fuzz: for ANY JSON-ish structure the compiler either returns a
    Column or raises CQLError — never IndexError/KeyError/TypeError/
    RecursionError. The POST body comes straight off the wire, so the
    walker's crash class IS its API."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from recipes_spark.plans.cql import CQLError, compile_cql_json

    leaves = st.one_of(
        st.none(), st.booleans(), st.integers(-5, 5), st.floats(allow_nan=False),
        st.sampled_from([
            "click", "2020-01-01", "..", "value", "c%",
            {"property": "value"}, {"property": "ts"},
            {"timestamp": "2020-01-01 00:00:00"}, {"timestamp": "garbage"},
            {"timestamp": 123}, {"date": None},
            {"date": "2020-01-01"}, {"interval": ["..", ".."]},
            {"interval": [1, 2]}, {"interval": "nope"},
            {"bbox": [0, 0, 1, 1]}, {"bbox": [1, 2]},
            {"bbox": ["a", "b", "c", "d"]},
            {"type": "Point", "coordinates": [0, 0]},
            {"type": "Point"}, {"type": "Point", "coordinates": "xy"},
            {"type": "Polygon", "coordinates": []},
            {"type": "Polygon", "coordinates": ["ring"]},
            {"op": 7, "args": []},
        ]),
    )
    ops = st.sampled_from([
        "and", "or", "not", "=", "<", ">=", "between", "in", "isNull",
        "like", "casei", "s_intersects", "t_before", "anyinteracts", "bogus",
    ])
    nodes = st.recursive(
        leaves,
        lambda kids: st.fixed_dictionaries(
            {"op": ops, "args": st.lists(kids, max_size=3)}
        ),
        max_leaves=8,
    )

    @settings(max_examples=400, deadline=None)
    @given(nodes)
    def fuzz(node):
        try:
            compile_cql_json(node)
        except CQLError:
            pass

    fuzz()


def test_quoted_identifier_filters_projection_property(spark):
    """xstac-shaped items carry a "proj:epsg" property
    (avhrr…/recipe.py:128-136): CQL2's double-quoted identifier
    spelling must compile in the text parser, and the JSON encoding's
    {"property": "proj:epsg"} must resolve the same column — both
    verbatim, never dot-split."""
    from recipes_spark.plans.cql import compile_cql_json
    from recipes_spark.plans.items import (
        DATACUBE_EXT,
        PROJECTION_EXT,
        build_items,
    )

    meta = spark.createDataFrame(
        [
            ("i1", "c1", -10.0, -5.0, 0.0, 5.0,
             "2024-01-01 00:00:00", "2024-01-02 00:00:00", "u1"),
            ("i2", "c1", 20.0, 10.0, 30.0, 15.0,
             "2024-02-01 00:00:00", "2024-02-02 00:00:00", "u2"),
        ],
        "item_id string, collection_id string, west double, south double,"
        " east double, north double, start_datetime string,"
        " end_datetime string, source_url string",
    ).withColumn("start_datetime", F.to_timestamp("start_datetime")) \
     .withColumn("end_datetime", F.to_timestamp("end_datetime"))
    items = build_items(
        meta,
        projection={
            "reference_system": "epsg:4326",
            "x_dimension": "ni",
            "y_dimension": "nj",
        },
    )
    flat = items.select(
        F.col("properties").getField("proj:epsg").alias("proj:epsg"),
        F.col("properties").getField("cube:dimensions").alias("cube"),
        "stac_extensions",
    )
    rows = flat.collect()
    assert all(r["proj:epsg"] == 4326 for r in rows)
    assert all('"ni"' in r["cube"] and '"nj"' in r["cube"] for r in rows)
    assert all(
        r["stac_extensions"][:2] == [PROJECTION_EXT, DATACUBE_EXT]
        for r in rows
    )
    assert flat.filter(compile_cql('"proj:epsg" = 4326')).count() == 2
    assert flat.filter(compile_cql('"proj:epsg" <> 4326')).count() == 0
    assert (
        flat.filter(
            compile_cql_json(
                {"op": "=", "args": [{"property": "proj:epsg"}, 4326]}
            )
        ).count()
        == 2
    )
