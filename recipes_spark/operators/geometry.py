"""G1: trajectory geometry extraction + simplification (SURVEY.md §2.9).

The reference calls stac_insitu.geometry.extract_geometry(ds.squeeze(),
tolerance=0.001, x="LONGITUDE", y="LATITUDE", time="TIME")
(insitu…/recipe.py:91-93): from a platform's coordinate arrays it
produces a Point (stationary platform) or a Douglas-Peucker-simplified
LineString (moving platform) plus the matching time array. shapely is
not in this container, so the simplifier is a self-contained numpy
Douglas-Peucker running inside an Arrow-batched pandas UDF — the one
operator in the engine with no Catalyst/SQL equivalent (SURVEY §4.2).

Scale design: the UDF is row-local (one trajectory per row, coordinate
ARRAYs already assembled by a groupBy upstream), so it parallelizes
embarrassingly — no shuffle inside, Arrow batch transfer, and the
output is small (simplified arrays). Observed in-situ platforms are
thousands of points at most; for trajectories beyond per-task memory,
the CHUNKED variant is shipped (round 13, no longer a docstring
promise): queries/geometry.g1_trajectory_simplify_chunked runs the
same integer DP per fixed-size chunk with seam points duplicated as
shared endpoints — per-task arrays bounded at chunk+1 points, the
tolerance guarantee preserved globally (what chunking trades is
MINIMALITY: seams are always pinned and kept sets can differ from
full-trajectory DP in either direction inside a chunk — fidelity,
the within-tol property, never degrades), fully oracled, and measured
at dense trajectories in SCALE.md (dp_chunked_dense).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

GEOMETRY_SCHEMA = StructType(
    [
        StructField("geom_type", StringType()),
        StructField("lon", ArrayType(DoubleType())),
        StructField("lat", ArrayType(DoubleType())),
        StructField("n_in", IntegerType()),
        StructField("n_out", IntegerType()),
        StructField("geojson", StringType()),
    ]
)


def douglas_peucker_mask(x: np.ndarray, y: np.ndarray, tol: float) -> np.ndarray:
    """Boolean keep-mask of the Douglas-Peucker simplification: endpoints
    always kept; an interior point survives iff its perpendicular
    distance to the current segment exceeds `tol` (planar degrees, the
    same convention as shapely's simplify the reference relies on)."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        dx, dy = x[j] - x[i], y[j] - y[i]
        px, py = x[i + 1 : j], y[i + 1 : j]
        L2 = dx * dx + dy * dy
        if L2 == 0.0:
            d = np.hypot(px - x[i], py - y[i])
        else:
            # Distance to the SEGMENT (t clamped), not the infinite
            # line: a vertex projecting beyond an endpoint must be
            # measured against that endpoint or the tolerance guarantee
            # (every dropped vertex within tol of the simplified line)
            # breaks. Matches GEOS/shapely behavior.
            t = np.clip(((px - x[i]) * dx + (py - y[i]) * dy) / L2, 0.0, 1.0)
            d = np.hypot(px - (x[i] + t * dx), py - (y[i] + t * dy))
        k = int(np.argmax(d))
        if d[k] > tol:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def douglas_peucker_mask_grid(
    x: np.ndarray, y: np.ndarray, tol2: int
) -> np.ndarray:
    """INTEGER-EXACT Douglas-Peucker keep-mask over integer grid
    coordinates (round 12 — what made g1 oracleable): the split test
    compares exact integer rationals instead of float distances.
    For segment A→B and interior point P, the squared segment
    distance is d² = num/scale with
      scale = max(|AB|², 1) and
      num   = |PA|²             (degenerate A == B)
            = |PA|²·|AB|²       (P projects before A: s = PA·AB ≤ 0)
            = |PB|²·|AB|²       (P projects past B: s ≥ |AB|²)
            = |PA|²·|AB|² − s²  (perpendicular case)
    — every quantity int64 (coords ≤ 36000 ⇒ num ≤ ~2.5e18), so the
    split condition d² > tol² is the exact integer comparison
    num > tol2·scale, the split point is the FIRST maximum of num
    (lowest index — numpy argmax convention, mirrored by the oracle's
    (num, −idx) packing), and the whole recursion is deterministic
    arithmetic a recursive SQL CTE replays bit-for-bit. Same stack
    recursion and clamped-segment semantics as douglas_peucker_mask;
    ``tol2`` is the SQUARED tolerance in grid units."""
    n = len(x)
    # Exactness precondition, ENFORCED (not just documented): num is a
    # product of two squared distances, each ≤ 2·E² for coordinate
    # extent E = max(span_x, span_y), so num ≤ 4·E⁴ — which must stay
    # below 2^63 or numpy int64 silently wraps and the keep-mask goes
    # wrong without an error. E ≤ 38967 satisfies 4·E⁴ < 2^63 (the
    # documented 36000-unit grid has 2.7× headroom); a caller on a
    # finer grid must rescale, not overflow.
    ext = max(
        int(x.max()) - int(x.min()), int(y.max()) - int(y.min())
    )
    if 4 * ext**4 >= 2**63:
        raise ValueError(
            f"douglas_peucker_mask_grid: coordinate extent {ext} "
            "overflows the exact int64 split test (max 38967 grid "
            "units) — rescale the grid"
        )
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        dx = int(x[j] - x[i])
        dy = int(y[j] - y[i])
        L2 = dx * dx + dy * dy
        px, py = x[i + 1 : j], y[i + 1 : j]
        pax, pay = px - x[i], py - y[i]
        q_a = pax * pax + pay * pay
        if L2 == 0:
            num, scale = q_a, 1
        else:
            s = pax * dx + pay * dy
            pbx, pby = px - x[j], py - y[j]
            q_b = pbx * pbx + pby * pby
            num = np.where(
                s <= 0, q_a * L2, np.where(s >= L2, q_b * L2, q_a * L2 - s * s)
            )
            scale = L2
        k = int(np.argmax(num))
        if int(num[k]) > tol2 * scale:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def _extract_one(lon: np.ndarray, lat: np.ndarray, tol: float) -> dict:
    """extract_geometry semantics for one platform: finite points only;
    all-identical (or single) position → Point, else simplified
    LineString. The returned dict carries a non-schema ``__keep`` key
    (DP keep-mask over the finite-filtered points, or None for
    Point/empty) so callers pairing per-vertex payloads (times) reuse
    THE mask that built the LineString instead of recomputing it —
    one DP pass, no drift risk between vertices and payload."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    finite = np.isfinite(lon) & np.isfinite(lat)
    lon, lat = lon[finite], lat[finite]
    n_in = int(len(lon))
    if n_in == 0:
        return {
            "geom_type": None, "lon": [], "lat": [],
            "n_in": 0, "n_out": 0, "geojson": None, "__keep": None,
        }
    stationary = bool(np.all(lon == lon[0]) and np.all(lat == lat[0]))
    if n_in == 1 or stationary:
        gj = {"type": "Point", "coordinates": [float(lon[0]), float(lat[0])]}
        return {
            "geom_type": "Point",
            "lon": [float(lon[0])], "lat": [float(lat[0])],
            "n_in": n_in, "n_out": 1, "geojson": json.dumps(gj),
            "__keep": None,
        }
    keep = douglas_peucker_mask(lon, lat, tol)
    slon, slat = lon[keep], lat[keep]
    gj = {
        "type": "LineString",
        "coordinates": [[float(a), float(b)] for a, b in zip(slon, slat)],
    }
    return {
        "geom_type": "LineString",
        "lon": [float(v) for v in slon], "lat": [float(v) for v in slat],
        "n_in": n_in, "n_out": int(keep.sum()), "geojson": json.dumps(gj),
        "__keep": keep,
    }


def extract_geometry(
    lon_col: Column | str, lat_col: Column | str, *, tolerance: float = 0.001
) -> Column:
    """Column expression: (array<double> lon, array<double> lat) →
    geometry struct. Use after a sort_array(collect_list(...)) groupBy
    that assembles per-platform coordinate arrays in time order."""

    @F.pandas_udf(GEOMETRY_SCHEMA)
    def _udf(lon_s: pd.Series, lat_s: pd.Series) -> pd.DataFrame:
        rows = []
        for a, b in zip(lon_s, lat_s):
            out = _extract_one(a, b, tolerance)
            out.pop("__keep")
            rows.append(out)
        return pd.DataFrame(rows)

    return _udf(lon_col, lat_col)


TRAJECTORY_SCHEMA = StructType(
    GEOMETRY_SCHEMA.fields + [StructField("times", ArrayType(StringType()))]
)


def extract_trajectory(
    lon_col: Column | str,
    lat_col: Column | str,
    times_col: Column | str,
    *,
    tolerance: float = 0.001,
) -> Column:
    """extract_geometry plus the matching time array (the reference's
    `geometry, time = extract_geometry(...)` two-value contract,
    insitu…/recipe.py:91-93): a moving platform yields a simplified
    LineString with `times` = the timestamps of the KEPT vertices
    (moving-features pairing: coordinate i ↔ time i); a stationary
    platform yields a Point with `times` null — the caller then omits
    properties.datetimes, mirroring recipe.py:100-101 where the key is
    added only when time is not None. `times_col` is array<string>
    (pre-formatted ISO), index-aligned with lon/lat."""

    @F.pandas_udf(TRAJECTORY_SCHEMA)
    def _udf(
        lon_s: pd.Series, lat_s: pd.Series, t_s: pd.Series
    ) -> pd.DataFrame:
        rows = []
        for lon, lat, times in zip(lon_s, lat_s, t_s):
            lon = np.asarray(lon, dtype=np.float64)
            lat = np.asarray(lat, dtype=np.float64)
            times = list(times)
            finite = np.isfinite(lon) & np.isfinite(lat)
            times = [t for t, ok in zip(times, finite) if ok]
            out = _extract_one(lon, lat, tolerance)
            keep = out.pop("__keep")
            if out["geom_type"] == "LineString":
                out["times"] = [t for t, k in zip(times, keep) if k]
            else:
                out["times"] = None
            rows.append(out)
        return pd.DataFrame(rows)

    return _udf(lon_col, lat_col, times_col)


def trajectories_from_events(events: DataFrame) -> DataFrame:
    """Deterministic synthetic per-user trajectory from the events table
    (testdata has no coordinate columns): each event contributes one
    vertex, time-ordered; lon/lat derived from event fields. Stands in
    for the reference's per-platform LONGITUDE/LATITUDE/TIME arrays."""
    pt = F.struct(
        F.col("ts"),
        (F.pmod(F.col("event_id") * 7919, F.lit(36000)) / 100.0 - 180.0).alias(
            "lon"
        ),
        (F.pmod(F.col("event_id") * 104729, F.lit(17000)) / 100.0 - 85.0).alias(
            "lat"
        ),
    )
    return (
        events.select("user_id", pt.alias("pt"))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("pt")).alias("pts"))
        .select(
            "user_id",
            F.col("pts.lon").alias("lon"),
            F.col("pts.lat").alias("lat"),
            F.transform(
                "pts", lambda p: F.date_format(p["ts"], "yyyy-MM-dd'T'HH:mm:ss")
            ).alias("times"),
            F.size("pts").alias("n_points"),
        )
    )


def grid_nearest_neighbor(
    qs: DataFrame, st: DataFrame, *, cell: int
) -> DataFrame:
    """EXACT 1-NN spatial join via grid bucketing (g6_grid_knn's core,
    parameterized for the stress probe): `qs(query_id, px, py)` x
    `st(site_id, sx, sy)` in integer coordinates -> (query_id, d2,
    site_id), smallest-id tiebreak. Sites replicate to their 3x3
    neighbor cells; a block winner with d2 <= cell^2 is PROVABLY the
    global nearest (anything outside the block is > one full cell away
    in some axis); uncertified queries fall back to a broadcast brute
    pass, so the result is exact at any density while the quadratic
    scan runs only on the uncertified remainder."""
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    sites9 = st.select(
        "site_id", "sx", "sy", F.explode(offsets).alias("o")
    ).select(
        "site_id", "sx", "sy",
        (F.floor(F.col("sx") / cell) + F.col("o.dx")).alias("cx"),
        (F.floor(F.col("sy") / cell) + F.col("o.dy")).alias("cy"),
    )
    d2 = (F.col("px") - F.col("sx")) * (F.col("px") - F.col("sx")) + (
        F.col("py") - F.col("sy")
    ) * (F.col("py") - F.col("sy"))
    best = F.min(F.struct("d2", "site_id")).alias("best")
    unpack = [
        F.col("best.d2").alias("d2"),
        F.col("best.site_id").alias("site_id"),
    ]
    block = (
        qs.join(
            sites9,
            (F.floor(F.col("px") / cell) == F.col("cx"))
            & (F.floor(F.col("py") / cell) == F.col("cy")),
        )
        .select("query_id", d2.alias("d2"), "site_id")
        .groupBy("query_id")
        .agg(best)
        .select("query_id", *unpack)
    )
    certified = block.filter(F.col("d2") <= cell * cell)
    leftover = qs.join(certified, "query_id", "left_anti")
    brute = (
        F.broadcast(leftover)
        .crossJoin(st)
        .select("query_id", d2.alias("d2"), "site_id")
        .groupBy("query_id")
        .agg(best)
        .select("query_id", *unpack)
    )
    return certified.unionByName(brute)
