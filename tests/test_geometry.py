"""G1 property tests (SURVEY.md §5.2 item 2): Douglas-Peucker
guarantees that no DuckDB oracle can express — kept-subset, endpoint
preservation, and the tolerance bound."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from recipes_spark.operators.geometry import (
    _extract_one,
    douglas_peucker_mask,
)


def _dist_to_polyline(px, py, xs, ys):
    """Min distance from point (px,py) to the polyline (xs,ys)."""
    best = np.inf
    for i in range(len(xs) - 1):
        ax, ay, bx, by = xs[i], ys[i], xs[i + 1], ys[i + 1]
        dx, dy = bx - ax, by - ay
        L2 = dx * dx + dy * dy
        t = 0.0 if L2 == 0 else max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / L2))
        best = min(best, float(np.hypot(px - (ax + t * dx), py - (ay + t * dy))))
    return best


def test_endpoints_always_kept():
    x = np.array([0.0, 1.0, 2.0, 3.0])
    y = np.array([0.0, 5.0, -5.0, 0.0])
    keep = douglas_peucker_mask(x, y, tol=100.0)
    assert keep[0] and keep[-1]
    assert keep.sum() == 2  # everything within tolerance collapses


def test_collinear_collapses_to_segment():
    x = np.linspace(0, 10, 50)
    y = 2.0 * x + 1.0
    keep = douglas_peucker_mask(x, y, tol=1e-9)
    assert keep.sum() == 2


def test_sharp_corner_survives():
    x = np.array([0.0, 1.0, 2.0])
    y = np.array([0.0, 1.0, 0.0])
    keep = douglas_peucker_mask(x, y, tol=0.5)
    assert keep.tolist() == [True, True, True]


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(-180, 180, allow_nan=False, width=32),
            st.floats(-85, 85, allow_nan=False, width=32),
        ),
        min_size=2,
        max_size=80,
    ),
    st.floats(0.01, 10.0),
)
def test_tolerance_bound_property(points, tol):
    """Every dropped vertex lies within `tol` of the simplified line —
    the defining DP guarantee (simplified line ⊆ tol-buffer)."""
    x = np.array([p[0] for p in points], dtype=float)
    y = np.array([p[1] for p in points], dtype=float)
    keep = douglas_peucker_mask(x, y, tol)
    sx, sy = x[keep], y[keep]
    assert keep[0] and keep[-1]
    if len(sx) < 2:
        return
    for px, py in zip(x[~keep], y[~keep]):
        assert _dist_to_polyline(px, py, sx, sy) <= tol + 1e-9


def test_stationary_platform_is_point():
    out = _extract_one(np.array([5.0, 5.0, 5.0]), np.array([1.0, 1.0, 1.0]), 0.001)
    assert out["geom_type"] == "Point"
    assert out["n_out"] == 1
    assert '"Point"' in out["geojson"]


def test_moving_platform_is_linestring():
    out = _extract_one(
        np.array([0.0, 1.0, 2.0, 3.0]), np.array([0.0, 4.0, -4.0, 0.0]), 0.001
    )
    assert out["geom_type"] == "LineString"
    assert out["n_out"] >= 2
    assert '"LineString"' in out["geojson"]


def test_nan_coordinates_filtered():
    out = _extract_one(
        np.array([0.0, np.nan, 2.0]), np.array([0.0, 1.0, 2.0]), 0.001
    )
    assert out["n_in"] == 2


def test_empty_trajectory():
    out = _extract_one(np.array([]), np.array([]), 0.001)
    assert out["geom_type"] is None and out["n_out"] == 0


@pytest.mark.usefixtures("spark")
def test_g1_query_runs(spark, sf_dir):
    from recipes_spark.registry import all_queries

    df = all_queries()["g1_trajectory_simplify"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_out <= r.n_in
        assert r.geom_type in ("Point", "LineString")


def test_moving_platform_item_shape(spark):
    """The insitu item contract (reference recipe.py:91-108): moving
    platforms emit LineString + properties.datetimes paired 1:1 with
    kept vertices + the moving-features extension; stationary platforms
    emit Point, null datetimes, no extension. Testdata has no
    stationary users, so craft both shapes here."""
    import json

    import pyspark.sql.functions as F

    from recipes_spark.operators.geometry import extract_trajectory
    from recipes_spark.plans.items import MOVING_FEATURES_EXT, build_items

    rows = [
        # stationary: same position thrice
        ("p-still", [10.0, 10.0, 10.0], [5.0, 5.0, 5.0],
         ["2024-01-01T00:00:00", "2024-01-01T01:00:00", "2024-01-01T02:00:00"]),
        # moving: zigzag nothing simplifies away at tol=0.001
        ("p-move", [0.0, 1.0, 2.0, 3.0], [0.0, 4.0, -4.0, 0.0],
         ["2024-02-01T00:00:00", "2024-02-01T01:00:00",
          "2024-02-01T02:00:00", "2024-02-01T03:00:00"]),
        # moving with a collinear interior vertex: DP at tol=0.5 drops it,
        # and its time must drop WITH it
        ("p-line", [0.0, 1.0, 2.0], [0.0, 0.0, 0.0],
         ["2024-03-01T00:00:00", "2024-03-01T01:00:00", "2024-03-01T02:00:00"]),
    ]
    df = spark.createDataFrame(
        rows, "pid string, lon array<double>, lat array<double>, times array<string>"
    ).withColumn("g", extract_trajectory("lon", "lat", "times", tolerance=0.5))
    meta = df.select(
        F.col("pid").alias("item_id"),
        F.lit("c").alias("collection_id"),
        F.array_min("lon").alias("west"),
        F.array_min("lat").alias("south"),
        F.array_max("lon").alias("east"),
        F.array_max("lat").alias("north"),
        F.to_timestamp(F.element_at("times", 1)).alias("start_datetime"),
        F.to_timestamp(F.element_at("times", -1)).alias("end_datetime"),
        F.lit("file:///x.nc").alias("source_url"),
        F.col("g.geojson").alias("geom"),
        F.col("g.times").alias("vertex_times"),
    )
    items = {
        r["id"]: r
        for r in build_items(
            meta, geometry_col="geom", datetimes_col="vertex_times"
        ).collect()
    }

    still = items["p-still"]
    g = json.loads(still.geometry)
    assert g["type"] == "Point" and g["coordinates"] == [10.0, 5.0]
    assert still.properties.datetimes is None
    assert list(still.stac_extensions) == []

    move = items["p-move"]
    g = json.loads(move.geometry)
    assert g["type"] == "LineString"
    assert len(move.properties.datetimes) == len(g["coordinates"]) == 4
    assert list(move.stac_extensions) == [MOVING_FEATURES_EXT]

    line = items["p-line"]
    g = json.loads(line.geometry)
    assert g["type"] == "LineString"
    assert g["coordinates"] == [[0.0, 0.0], [2.0, 0.0]]  # interior dropped
    assert list(line.properties.datetimes) == [
        "2024-03-01T00:00:00", "2024-03-01T02:00:00"  # time dropped with it
    ]
    assert list(line.stac_extensions) == [MOVING_FEATURES_EXT]
