"""G1/G2 geometry queries (SURVEY.md §2.9): trajectory extraction +
simplification over per-user event trajectories, and the pure-SQL
trajectory bbox the oracle CAN check."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from recipes_spark.io import load
from recipes_spark.operators.geometry import grid_nearest_neighbor
from recipes_spark.registry import query


#: Squared DP tolerance in centi-degree grid units: 0.5° = 50 units.
_G1_TOL2 = 50 * 50
#: Idx-packing base for the oracle's (num, lowest-idx) argmax — far
#: above any per-user point count.
_G1_PACK = 1 << 20

_G1_ORACLE = f"""
WITH RECURSIVE pts AS MATERIALIZED (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, xi, yi)
           - 1 AS idx,
         xi, yi
  FROM (SELECT user_id, ts,
          CAST(((event_id * 7919) % 36000 + 36000) % 36000 AS BIGINT)
            AS xi,
          CAST(((event_id * 104729) % 17000 + 17000) % 17000 AS BIGINT)
            AS yi
        FROM events)
), info AS MATERIALIZED (
  SELECT user_id, count(*) AS n,
         (min(xi) = max(xi) AND min(yi) = max(yi)) AS stat
  FROM pts GROUP BY user_id
), seg(user_id, i, j) AS (
  SELECT user_id, CAST(0 AS BIGINT), n - 1 FROM info
  WHERE n >= 2 AND NOT stat
  UNION ALL
  SELECT user_id,
         CASE WHEN h.h = 0 THEN sp.i ELSE sp.k END,
         CASE WHEN h.h = 0 THEN sp.k ELSE sp.j END
  FROM (
    SELECT g.user_id, g.i, g.j, ({_G1_PACK} - (g.mx % {_G1_PACK})) AS k
    FROM (
      SELECT s.user_id, s.i, s.j,
             max((CASE
                  WHEN ((b.xi-a.xi)*(b.xi-a.xi) + (b.yi-a.yi)*(b.yi-a.yi)) = 0
                    THEN (p.xi-a.xi)*(p.xi-a.xi) + (p.yi-a.yi)*(p.yi-a.yi)
                  WHEN ((p.xi-a.xi)*(b.xi-a.xi) + (p.yi-a.yi)*(b.yi-a.yi)) <= 0
                    THEN ((p.xi-a.xi)*(p.xi-a.xi) + (p.yi-a.yi)*(p.yi-a.yi))
                         * ((b.xi-a.xi)*(b.xi-a.xi) + (b.yi-a.yi)*(b.yi-a.yi))
                  WHEN ((p.xi-a.xi)*(b.xi-a.xi) + (p.yi-a.yi)*(b.yi-a.yi))
                       >= ((b.xi-a.xi)*(b.xi-a.xi) + (b.yi-a.yi)*(b.yi-a.yi))
                    THEN ((p.xi-b.xi)*(p.xi-b.xi) + (p.yi-b.yi)*(p.yi-b.yi))
                         * ((b.xi-a.xi)*(b.xi-a.xi) + (b.yi-a.yi)*(b.yi-a.yi))
                  ELSE ((p.xi-a.xi)*(p.xi-a.xi) + (p.yi-a.yi)*(p.yi-a.yi))
                       * ((b.xi-a.xi)*(b.xi-a.xi) + (b.yi-a.yi)*(b.yi-a.yi))
                       - ((p.xi-a.xi)*(b.xi-a.xi) + (p.yi-a.yi)*(b.yi-a.yi))
                       * ((p.xi-a.xi)*(b.xi-a.xi) + (p.yi-a.yi)*(b.yi-a.yi))
                  END)::HUGEINT * {_G1_PACK} + ({_G1_PACK} - p.idx)) AS mx,
             max(CASE
                  WHEN ((b.xi-a.xi)*(b.xi-a.xi) + (b.yi-a.yi)*(b.yi-a.yi)) = 0
                    THEN 1 ELSE
                    ((b.xi-a.xi)*(b.xi-a.xi) + (b.yi-a.yi)*(b.yi-a.yi)) END)
               AS scale
      FROM seg s
      JOIN pts a ON a.user_id = s.user_id AND a.idx = s.i
      JOIN pts b ON b.user_id = s.user_id AND b.idx = s.j
      JOIN pts p ON p.user_id = s.user_id AND p.idx > s.i AND p.idx < s.j
      GROUP BY s.user_id, s.i, s.j
    ) g
    WHERE (g.mx // {_G1_PACK}) > {_G1_TOL2} * g.scale
  ) sp
  CROSS JOIN (SELECT unnest(range(2)) AS h) h
), kept AS (
  SELECT user_id, count(DISTINCT idx) AS n_out FROM (
    SELECT user_id, i AS idx FROM seg
    UNION ALL SELECT user_id, j FROM seg
  ) GROUP BY user_id
)
SELECT i.user_id,
       CASE WHEN i.n = 1 OR i.stat THEN 'Point' ELSE 'LineString' END
         AS geom_type,
       CAST(i.n AS INT) AS n_in,
       CAST(CASE WHEN i.n = 1 OR i.stat THEN 1 ELSE k.n_out END AS INT)
         AS n_out
FROM info i LEFT JOIN kept k USING (user_id)
ORDER BY i.user_id
"""


@query("g1_trajectory_simplify", oracle=_G1_ORACLE)
def g1_trajectory_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 (insitu…/recipe.py:91-93): per-platform trajectory → Point or
    Douglas-Peucker LineString (tolerance 0.5°). FULLY ORACLED since
    round 12: the synthetic trajectory's coordinates live on an exact
    centi-degree INTEGER grid, so the simplification runs on the
    integer-exact DP mask (douglas_peucker_mask_grid — split tests and
    argmax as exact integer rationals, no float op anywhere) and the
    oracle replays the recursion as a recursive segment-splitting CTE:
    each round computes every open segment's max-distance interior
    point by the identical integer arithmetic and splits when
    num > tol²·scale. "Recursive with data-dependent depth" stopped
    meaning unoracleable — the CTE's fixpoint IS the stack's. The
    float-tolerance operator (extract_geometry / douglas_peucker_mask)
    is unchanged for real-coordinate callers; its tolerance/subset/
    endpoint property tests in tests/test_geometry.py still gate this
    query's semantics, plus an intent test pinning grid-mask ≡
    float-mask on the synthetic grid."""
    import numpy as np
    import pandas as pd

    from recipes_spark.operators.geometry import douglas_peucker_mask_grid

    ev = load(spark, sf_dir, "events")
    pt = F.struct(
        F.col("ts"),
        F.pmod(F.col("event_id") * 7919, F.lit(36000)).alias("xi"),
        F.pmod(F.col("event_id") * 104729, F.lit(17000)).alias("yi"),
    )
    traj = (
        ev.select("user_id", pt.alias("pt"))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("pt")).alias("pts"))
        .select(
            "user_id",
            F.col("pts.xi").alias("xi"),
            F.col("pts.yi").alias("yi"),
        )
    )

    def simplify(batches):
        for pdf in batches:
            uids, gts, nins, nouts = [], [], [], []
            for uid, xs, ys in zip(pdf["user_id"], pdf["xi"], pdf["yi"]):
                x = np.asarray(xs, dtype=np.int64)
                y = np.asarray(ys, dtype=np.int64)
                n = len(x)
                stationary = bool((x == x[0]).all() and (y == y[0]).all())
                uids.append(uid)
                nins.append(n)
                if n == 1 or stationary:
                    gts.append("Point")
                    nouts.append(1)
                else:
                    keep = douglas_peucker_mask_grid(x, y, _G1_TOL2)
                    gts.append("LineString")
                    nouts.append(int(keep.sum()))
            yield pd.DataFrame(
                {
                    "user_id": uids,
                    "geom_type": gts,
                    "n_in": nins,
                    "n_out": nouts,
                }
            )

    return traj.mapInPandas(
        simplify, "user_id long, geom_type string, n_in int, n_out int"
    ).orderBy("user_id")


#: Chunk size for the memory-bounded DP variant: production sizes this
#: in the tens of thousands (the per-task array bound); 16 here so
#: multiple chunks and seams demonstrably fire at every test SF
#: (~67 points/user on the fixture).
_G1_CHUNK = 16

_G1_CHUNKED_ORACLE = f"""
WITH RECURSIVE pts AS MATERIALIZED (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, xi, yi)
           - 1 AS idx,
         xi, yi
  FROM (SELECT user_id, ts,
          CAST(((event_id * 7919) % 36000 + 36000) % 36000 AS BIGINT)
            AS xi,
          CAST(((event_id * 104729) % 17000 + 17000) % 17000 AS BIGINT)
            AS yi
        FROM events)
), info AS MATERIALIZED (
  SELECT user_id, count(*) AS n,
         (min(xi) = max(xi) AND min(yi) = max(yi)) AS stat
  FROM pts GROUP BY user_id
), bounds AS MATERIALIZED (
  SELECT p.user_id,
         CAST(min(p.idx) AS BIGINT) AS i,
         CAST(least(max(p.idx) + 1, i2.n - 1) AS BIGINT) AS j
  FROM pts p JOIN info i2 USING (user_id)
  WHERE i2.n >= 2 AND NOT i2.stat
  GROUP BY p.user_id, p.idx // {_G1_CHUNK}, i2.n
), seg(user_id, i, j) AS (
  SELECT user_id, i, j FROM bounds WHERE j > i
  UNION ALL
  SELECT user_id,
         CASE WHEN h.h = 0 THEN sp.i ELSE sp.k END,
         CASE WHEN h.h = 0 THEN sp.k ELSE sp.j END
  FROM (
    SELECT g.user_id, g.i, g.j, ({_G1_PACK} - (g.mx % {_G1_PACK})) AS k
    FROM (
      SELECT s.user_id, s.i, s.j,
             max((CASE
                  WHEN ((b.xi-a.xi)*(b.xi-a.xi) + (b.yi-a.yi)*(b.yi-a.yi)) = 0
                    THEN (p.xi-a.xi)*(p.xi-a.xi) + (p.yi-a.yi)*(p.yi-a.yi)
                  WHEN ((p.xi-a.xi)*(b.xi-a.xi) + (p.yi-a.yi)*(b.yi-a.yi)) <= 0
                    THEN ((p.xi-a.xi)*(p.xi-a.xi) + (p.yi-a.yi)*(p.yi-a.yi))
                         * ((b.xi-a.xi)*(b.xi-a.xi) + (b.yi-a.yi)*(b.yi-a.yi))
                  WHEN ((p.xi-a.xi)*(b.xi-a.xi) + (p.yi-a.yi)*(b.yi-a.yi))
                       >= ((b.xi-a.xi)*(b.xi-a.xi) + (b.yi-a.yi)*(b.yi-a.yi))
                    THEN ((p.xi-b.xi)*(p.xi-b.xi) + (p.yi-b.yi)*(p.yi-b.yi))
                         * ((b.xi-a.xi)*(b.xi-a.xi) + (b.yi-a.yi)*(b.yi-a.yi))
                  ELSE ((p.xi-a.xi)*(p.xi-a.xi) + (p.yi-a.yi)*(p.yi-a.yi))
                       * ((b.xi-a.xi)*(b.xi-a.xi) + (b.yi-a.yi)*(b.yi-a.yi))
                       - ((p.xi-a.xi)*(b.xi-a.xi) + (p.yi-a.yi)*(b.yi-a.yi))
                       * ((p.xi-a.xi)*(b.xi-a.xi) + (p.yi-a.yi)*(b.yi-a.yi))
                  END)::HUGEINT * {_G1_PACK} + ({_G1_PACK} - p.idx)) AS mx,
             max(CASE
                  WHEN ((b.xi-a.xi)*(b.xi-a.xi) + (b.yi-a.yi)*(b.yi-a.yi)) = 0
                    THEN 1 ELSE
                    ((b.xi-a.xi)*(b.xi-a.xi) + (b.yi-a.yi)*(b.yi-a.yi)) END)
               AS scale
      FROM seg s
      JOIN pts a ON a.user_id = s.user_id AND a.idx = s.i
      JOIN pts b ON b.user_id = s.user_id AND b.idx = s.j
      JOIN pts p ON p.user_id = s.user_id AND p.idx > s.i AND p.idx < s.j
      GROUP BY s.user_id, s.i, s.j
    ) g
    WHERE (g.mx // {_G1_PACK}) > {_G1_TOL2} * g.scale
  ) sp
  CROSS JOIN (SELECT unnest(range(2)) AS h) h
), kept AS (
  SELECT user_id, count(DISTINCT idx) AS n_out FROM (
    SELECT user_id, i AS idx FROM seg
    UNION ALL SELECT user_id, j FROM seg
  ) GROUP BY user_id
)
SELECT i.user_id,
       CASE WHEN i.n = 1 OR i.stat THEN 'Point' ELSE 'LineString' END
         AS geom_type,
       CAST(i.n AS INT) AS n_in,
       CAST(CASE WHEN i.n = 1 OR i.stat THEN 1 ELSE k.n_out END AS INT)
         AS n_out
FROM info i LEFT JOIN kept k USING (user_id)
ORDER BY i.user_id
"""


@query("g1_trajectory_simplify_chunked", oracle=_G1_CHUNKED_ORACLE)
def g1_trajectory_simplify_chunked(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MEMORY-BOUNDED Douglas-Peucker (r12 verdict task 4): g1's one
    documented unprobed bound was "one user's full point array in one
    task" — this variant never assembles it. Points get a per-user
    index (window row_number — external-sortable, spillable), chunk at
    fixed seams (floor(idx/chunk)), and each seam point is DUPLICATED
    into the preceding chunk as its right endpoint, so every
    per-(user, chunk) group is ≤ chunk+1 points — the per-task memory
    bound, whatever the trajectory length. The grid DP mask
    (douglas_peucker_mask_grid, integer-exact) runs per chunk; kept
    vertex indices union (DISTINCT folds the shared seams) into the
    per-user count.

    Error contract (documented, not hand-waved): chunk endpoints are
    always kept, so the output polyline is the concatenation of the
    chunk polylines — every dropped vertex is within tol of its own
    chunk's simplified segment chain, which is a sub-polyline of the
    OUTPUT, so the Douglas-Peucker tolerance guarantee (each dropped
    vertex within tol of the result) holds globally. What chunking
    relaxes is MINIMALITY: seams (and vertices they shadow) may be
    kept that full-trajectory DP would drop — fidelity is never lost,
    only compression; with chunk ≥ n the output equals unchunked g1
    exactly (gated in tests/test_intent_round13.py). The oracle
    replays the same recursion from per-chunk initial segments.

    100 TB: the windows (idx) and the (user, chunk) assembly share
    user-keyed exchanges with bounded groups; the DP kernel is the
    same embarrassingly-parallel Arrow island as g1 but with an
    O(chunk) per-row bound instead of O(trajectory); the kept-index
    count is a user-keyed agg over kept vertices. A million-point
    platform costs ⌈n/chunk⌉ bounded tasks instead of one unbounded
    one."""
    import numpy as np
    import pandas as pd

    from recipes_spark.operators.geometry import douglas_peucker_mask_grid

    C = _G1_CHUNK
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "ts",
        F.pmod(F.col("event_id") * 7919, F.lit(36000)).alias("xi"),
        F.pmod(F.col("event_id") * 104729, F.lit(17000)).alias("yi"),
    )
    users = base.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        (
            (F.min("xi") == F.max("xi")) & (F.min("yi") == F.max("yi"))
        ).alias("stat"),
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "xi", "yi")
    pts = base.select(
        "user_id",
        "xi",
        "yi",
        (F.row_number().over(wo) - 1).cast("long").alias("idx"),
    )
    line_users = users.filter((F.col("n") >= 2) & (~F.col("stat")))
    cmain = F.floor(F.col("idx") / C).cast("long")
    chunked = (
        pts.join(line_users.select("user_id"), "user_id")
        .select(
            "user_id",
            "idx",
            "xi",
            "yi",
            F.explode(
                F.when(
                    (F.col("idx") % C == 0) & (F.col("idx") > 0),
                    F.array(cmain, cmain - 1),
                ).otherwise(F.array(cmain))
            ).alias("chunk"),
        )
    )
    grouped = chunked.groupBy("user_id", "chunk").agg(
        F.sort_array(
            F.collect_list(F.struct("idx", "xi", "yi"))
        ).alias("pts")
    )

    def simplify(batches):
        for pdf in batches:
            out_u, out_i = [], []
            for uid, rows in zip(pdf["user_id"], pdf["pts"]):
                idxs = np.asarray([r["idx"] for r in rows], dtype=np.int64)
                x = np.asarray([r["xi"] for r in rows], dtype=np.int64)
                y = np.asarray([r["yi"] for r in rows], dtype=np.int64)
                keep = douglas_peucker_mask_grid(x, y, _G1_TOL2)
                for i in idxs[keep]:
                    out_u.append(uid)
                    out_i.append(int(i))
            yield pd.DataFrame(
                {
                    "user_id": pd.Series(out_u, dtype="int64"),
                    "idx": pd.Series(out_i, dtype="int64"),
                }
            )

    kept = grouped.mapInPandas(simplify, "user_id long, idx long")
    n_out = kept.groupBy("user_id").agg(
        F.countDistinct("idx").cast("int").alias("n_out_line")
    )
    is_point = (F.col("n") == 1) | F.col("stat")
    return (
        users.join(n_out, "user_id", "left")
        .select(
            "user_id",
            F.when(is_point, F.lit("Point"))
            .otherwise(F.lit("LineString"))
            .alias("geom_type"),
            F.col("n").cast("int").alias("n_in"),
            F.when(is_point, F.lit(1))
            .otherwise(F.col("n_out_line"))
            .cast("int")
            .alias("n_out"),
        )
        .orderBy("user_id")
    )


@query(
    "g2_trajectory_bbox",
    oracle="""
SELECT user_id,
       round(min((((event_id * 7919) % 36000) + 36000) % 36000 / 100.0 - 180.0), 2) AS west,
       round(min((((event_id * 104729) % 17000) + 17000) % 17000 / 100.0 - 85.0), 2) AS south,
       round(max((((event_id * 7919) % 36000) + 36000) % 36000 / 100.0 - 180.0), 2) AS east,
       round(max((((event_id * 104729) % 17000) + 17000) % 17000 / 100.0 - 85.0), 2) AS north,
       count(*) AS n_points
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def g2_trajectory_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: trajectory bounding box — the aggregate the reference
    computes per-file for item bboxes (avhrr…/recipe.py:51-56), as a
    pure min/max groupBy (oracle-checkable; same synthetic lon/lat
    derivation as g1)."""
    ev = load(spark, sf_dir, "events")
    lon = F.pmod(F.col("event_id") * 7919, F.lit(36000)) / 100.0 - 180.0
    lat = F.pmod(F.col("event_id") * 104729, F.lit(17000)) / 100.0 - 85.0
    return (
        ev.select("user_id", lon.alias("lon"), lat.alias("lat"))
        .groupBy("user_id")
        .agg(
            F.round(F.min("lon"), 2).alias("west"),
            F.round(F.min("lat"), 2).alias("south"),
            F.round(F.max("lon"), 2).alias("east"),
            F.round(F.max("lat"), 2).alias("north"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .orderBy("user_id")
    )


_PIP_ORACLE = """
WITH pts AS (
  SELECT c_custkey,
         CAST(-180 + (c_custkey * 7) % 360 AS DOUBLE)  AS px,
         CAST(-90 + (c_custkey * 13) % 180 AS DOUBLE)  AS py
  FROM customer
)
SELECT c_custkey, px, py
FROM pts
WHERE (40.0 - (-60.0)) * (py - (-30.0)) - (0.0 - (-30.0)) * (px - (-60.0)) >= 0
  AND (80.0 - 40.0) * (py - 0.0) - (40.0 - 0.0) * (px - 40.0) >= 0
  AND (0.0 - 80.0) * (py - 40.0) - (70.0 - 40.0) * (px - 80.0) >= 0
  AND (-80.0 - 0.0) * (py - 70.0) - (35.0 - 70.0) * (px - 0.0) >= 0
  AND (-60.0 - (-80.0)) * (py - 35.0) - (-30.0 - 35.0) * (px - (-80.0)) >= 0
ORDER BY c_custkey
"""


@query("g4_point_in_polygon", oracle=_PIP_ORACLE)
def g4_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: true point-in-polygon for a CONVEX query polygon — the step
    beyond the engine's envelope semantics (G3/S_INTERSECTS): a point
    is inside a counterclockwise convex ring iff every edge's cross
    product (x2−x1)(py−y1) − (y2−y1)(px−x1) is non-negative — five
    pure-Catalyst comparisons for this pentagon, zero UDFs, fully
    pushdown-friendly. Points derive from customer keys (integer
    arithmetic → exactly representable doubles), so every cross
    product is an exact double and the sign test is deterministic on
    both engines — float PIP on measured coordinates would need an
    epsilon, but the DEGENERATE-case policy (on-edge = inside, the >=)
    is explicit either way.

    100 TB: row-local projection + filter, scan-bound; a concave or
    multi-ring polygon decomposes into convex pieces OR'd together at
    compile time (the CQL2 spatial compiler's planned extension
    point), keeping the per-row cost edges-linear with no UDF."""
    c = load(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        (-180 + (F.col("c_custkey") * 7) % 360).cast("double").alias("px"),
        (-90 + (F.col("c_custkey") * 13) % 180).cast("double").alias("py"),
    )
    # CCW pentagon: (-60,-30) (40,0) (80,40) (0,70) (-80,35)
    ring = [
        (-60.0, -30.0),
        (40.0, 0.0),
        (80.0, 40.0),
        (0.0, 70.0),
        (-80.0, 35.0),
    ]
    px, py = F.col("px"), F.col("py")
    cond = None
    for (x1, y1), (x2, y2) in zip(ring, ring[1:] + ring[:1]):
        edge = (
            F.lit(x2 - x1) * (py - F.lit(y1))
            - F.lit(y2 - y1) * (px - F.lit(x1))
        ) >= 0
        cond = edge if cond is None else (cond & edge)
    return pts.filter(cond).orderBy("c_custkey")


_TILE_ORACLE = """
WITH meta AS (
  SELECT 'item-' || CAST(o_orderkey AS VARCHAR) AS item_id,
         CAST(-180 + (o_orderkey % 340) AS DOUBLE) AS west,
         CAST(-85 + (o_custkey % 170) AS DOUBLE)   AS south,
         CAST(-180 + (o_orderkey % 340) + 10 AS DOUBLE) AS east,
         CAST(-85 + (o_custkey % 170) + 5 AS DOUBLE)    AS north
  FROM orders
), tiles AS (
  SELECT item_id,
         unnest(range(CAST(floor((west + 180) / 22.5) AS BIGINT),
                      least(CAST(floor((east + 180) / 22.5) AS BIGINT),
                            15) + 1)) AS tx,
         CAST(floor((south + 90) / 22.5) AS BIGINT) AS ty_lo,
         least(CAST(floor((north + 90) / 22.5) AS BIGINT), 7) AS ty_hi
  FROM meta
), cells AS (
  SELECT item_id, tx, unnest(range(ty_lo, ty_hi + 1)) AS ty FROM tiles
)
SELECT tx, ty, CAST(count(*) AS BIGINT) AS n_items
FROM cells
GROUP BY tx, ty
ORDER BY tx, ty
"""


@query("g5_tile_cover", oracle=_TILE_ORACLE)
def g5_tile_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5: TILE-COVER index — for every item footprint, the z=4 grid
    tiles (16×8 over lon/lat) it intersects, rolled up to per-tile item
    counts: the tile index a map/catalog server builds so a viewport
    query touches only its tiles' items (the reference serves satellite
    footprints through exactly such spatial indexing, pgstac-side).
    Pure Catalyst: floor arithmetic for the corner tiles, one
    2-D explode via sequence() for the covered range (clamped at the
    grid edge so the +10°/+5° fixture boxes cannot run off the
    antimeridian tile), then a hash agg.

    100 TB: replication factor = tiles per footprint (bounded by
    footprint/tile size); the only shuffle carries (tile, count)
    partials — this is interval_overlap_join's bucket-replication idea
    in two dimensions, and the same salting rule applies to a hot tile
    (a popular coastal cell)."""
    o = load(spark, sf_dir, "orders")
    west = (-180 + (F.col("o_orderkey") % 340)).cast("double")
    south = (-85 + (F.col("o_custkey") % 170)).cast("double")
    m = o.select(
        F.concat(F.lit("item-"), F.col("o_orderkey").cast("string")).alias(
            "item_id"
        ),
        west.alias("west"),
        south.alias("south"),
        (west + 10).alias("east"),
        (south + 5).alias("north"),
    )
    tx_lo = F.floor((F.col("west") + 180) / 22.5).cast("long")
    tx_hi = F.least(
        F.floor((F.col("east") + 180) / 22.5).cast("long"), F.lit(15)
    )
    ty_lo = F.floor((F.col("south") + 90) / 22.5).cast("long")
    ty_hi = F.least(
        F.floor((F.col("north") + 90) / 22.5).cast("long"), F.lit(7)
    )
    cells = m.select(
        "item_id",
        F.explode(F.sequence(tx_lo, tx_hi)).alias("tx"),
        ty_lo.alias("ty_lo"),
        ty_hi.alias("ty_hi"),
    ).select(
        "item_id",
        "tx",
        F.explode(F.sequence("ty_lo", "ty_hi")).alias("ty"),
    )
    return (
        cells.groupBy("tx", "ty")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .orderBy("tx", "ty")
    )


@query(
    "g6_grid_knn",
    oracle="""
WITH pts AS (
  SELECT event_id,
         (event_id * 48271) % 10000 AS px,
         (event_id * 16807) % 10000 AS py
  FROM events
), q AS (
  SELECT event_id AS query_id, px, py FROM pts WHERE event_id % 101 = 0
), s AS (
  SELECT event_id AS site_id, px, py FROM pts WHERE event_id % 101 <> 0
), d AS (
  SELECT q.query_id, s.site_id,
         (q.px - s.px) * (q.px - s.px)
           + (q.py - s.py) * (q.py - s.py) AS d2
  FROM q, s
), m AS (
  SELECT query_id, min(d2) AS best_d2 FROM d GROUP BY query_id
)
SELECT d.query_id,
       CAST(m.best_d2 AS BIGINT) AS d2,
       CAST(min(d.site_id) AS BIGINT) AS site_id
FROM d JOIN m ON d.query_id = m.query_id AND d.d2 = m.best_d2
GROUP BY d.query_id, m.best_d2
ORDER BY d.query_id
""",
)
def g6_grid_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT nearest-neighbor spatial join via GRID BUCKETING — the
    geo twin of x3's vector ANN, but with a proof instead of a recall
    gate: sites replicate to their 3x3 neighbor cells (cell = 1000
    units), queries equi-join their own cell, and the block-best
    candidate is PROVABLY the global nearest whenever its squared
    distance is <= cell^2 (any site outside the 3x3 block is > one
    full cell away in some axis). Queries the block cannot certify —
    empty neighborhood or best beyond the radius — fall back to a
    brute-force pass, so the result is exact by construction while
    the expensive scan runs only on the (empty here, rare anywhere)
    uncertified remainder. Deterministic integer coordinates hashed
    from event ids; ties break to the smallest site id via struct-min.

    100 TB: the replicated-grid join is the standard distributed
    spatial-join plan — replicate the SMALLER relation 9x (here sites;
    flip to queries when queries dominate), shuffle both on cell, and
    the per-cell work is density-bounded instead of all-pairs. The
    fallback leg broadcasts only the uncertified queries. The oracle
    is the all-pairs definition the grid plan must reproduce."""
    ev = load(spark, sf_dir, "events").select("event_id")
    pts = ev.select(
        "event_id",
        ((F.col("event_id") * 48271) % 10000).alias("px"),
        ((F.col("event_id") * 16807) % 10000).alias("py"),
    )
    g = 1000
    qs = pts.filter(F.col("event_id") % 101 == 0).select(
        F.col("event_id").alias("query_id"), "px", "py"
    )
    st = pts.filter(F.col("event_id") % 101 != 0).select(
        F.col("event_id").alias("site_id"),
        F.col("px").alias("sx"),
        F.col("py").alias("sy"),
    )
    return grid_nearest_neighbor(qs, st, cell=g).orderBy("query_id")


@query(
    "g7_points_in_polygons",
    oracle="""
WITH pts AS (
  SELECT c_custkey,
         -180 + (c_custkey * 7) % 360 AS px,
         -90 + (c_custkey * 13) % 180 AS py
  FROM customer
), polys AS (
  SELECT s_suppkey,
         -150 + (s_suppkey * 11) % 300 AS cx,
         -75 + (s_suppkey * 17) % 150 AS cy,
         5 + s_suppkey % 10 AS w,
         4 + s_suppkey % 8 AS h
  FROM supplier
)
SELECT s_suppkey,
       CAST(count_if(abs(px - cx) * h + abs(py - cy) * w <= w * h)
            AS BIGINT) AS n_inside
FROM polys, pts
GROUP BY s_suppkey
ORDER BY s_suppkey
""",
)
def g7_points_in_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Many-to-many SPATIAL CONTAINMENT JOIN — every customer point
    against every supplier diamond (convex quad |dx|·h + |dy|·w <=
    w·h, all-integer so containment is exact on both engines) — the
    polygon-side composition of g5's tile cover with g4's exact
    point-in-polygon test: polygons replicate to the 20-degree grid
    tiles their bbox covers, points hash to their single tile, the
    equi-join on (tx, ty) meets only co-located pairs, and the exact
    containment predicate + per-polygon count run AFTER the join.
    Zero-match polygons survive via a left join back to the polygon
    set. The oracle is the all-pairs definition (count_if over the
    cross product) the tiled plan must reproduce.

    100 TB: the classic PBSM / partition-based spatial-merge plan —
    candidate pairs are bounded by tile co-location (density x bbox
    area), never |points| x |polygons|; replication factor is
    bbox-tiles per polygon (<= 4 here); a hot tile (urban cluster)
    salts like any hot join key. The brute-force oracle at driver SF
    is exactly the quadratic plan this shape exists to avoid."""
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    pts = c.select(
        "c_custkey",
        (-180 + (F.col("c_custkey") * 7) % 360).alias("px"),
        (-90 + (F.col("c_custkey") * 13) % 180).alias("py"),
    )
    polys = s.select(
        "s_suppkey",
        (-150 + (F.col("s_suppkey") * 11) % 300).alias("cx"),
        (-75 + (F.col("s_suppkey") * 17) % 150).alias("cy"),
        (5 + F.col("s_suppkey") % 10).alias("w"),
        (4 + F.col("s_suppkey") % 8).alias("h"),
    )
    g = 20
    ptile = pts.select(
        "c_custkey", "px", "py",
        F.expr(f"(px + 180) div {g}").alias("tx"),
        F.expr(f"(py + 90) div {g}").alias("ty"),
    )
    cover = polys.select(
        "s_suppkey", "cx", "cy", "w", "h",
        F.explode(
            F.sequence(
                F.expr(f"(cx - w + 180) div {g}"),
                F.expr(f"(cx + w + 180) div {g}"),
            )
        ).alias("tx"),
        F.expr(f"(cy - h + 90) div {g}").alias("ty_lo"),
        F.expr(f"(cy + h + 90) div {g}").alias("ty_hi"),
    ).select(
        "s_suppkey", "cx", "cy", "w", "h", "tx",
        F.explode(F.sequence("ty_lo", "ty_hi")).alias("ty"),
    )
    inside = (
        F.abs(F.col("px") - F.col("cx")) * F.col("h")
        + F.abs(F.col("py") - F.col("cy")) * F.col("w")
        <= F.col("w") * F.col("h")
    )
    counts = (
        cover.join(ptile, ["tx", "ty"])
        .filter(inside)
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        polys.select("s_suppkey")
        .join(counts, "s_suppkey", "left")
        .select(
            "s_suppkey",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_inside"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "g8_stay_points",
    oracle="""
WITH pts AS (
  SELECT user_id, ts, event_id,
         (event_id * 7919) % 36000 AS ix,
         (event_id * 104729) % 17000 AS iy
  FROM events
), steps AS (
  SELECT user_id, ts, event_id, ix, iy,
         ix - lag(ix) OVER w AS dx,
         iy - lag(iy) OVER w AS dy
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN dx IS NOT NULL
               AND dx * dx + dy * dy <= 64000000 THEN 1 ELSE 0 END AS near
  FROM steps
), runs AS (
  SELECT user_id, near,
         sum(CASE WHEN near = 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS grp
  FROM flagged
), sized AS (
  SELECT user_id, grp, CAST(sum(near) AS BIGINT) AS run_len
  FROM runs GROUP BY user_id, grp
)
SELECT user_id,
       CAST(count_if(run_len >= 3) AS BIGINT) AS n_staypoints,
       CAST(coalesce(max(run_len), 0) AS BIGINT) AS longest_run
FROM sized
GROUP BY user_id
ORDER BY user_id
""",
)
def g8_stay_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STAY-POINT detection over per-user trajectories — the GPS-
    mining primitive behind home/work inference and POI extraction: a
    stay is a run of >= 3 consecutive small steps (squared step
    distance <= R^2 in the integer coordinate units g1/g2 derive
    positions from — exact, no haversine float surface). Runs come
    from gaps-and-islands: a far step increments the group id (running
    sum of breaks), near-step counts aggregate per group, and the
    per-user rollup counts qualifying runs and the longest one.

    100 TB: the lag window, the islands window, and both aggs all
    cluster on user_id — ONE exchange end to end (the funnel-pass
    rule); a production variant adds a minimum DURATION bound from
    the run's ts span, same shape with a min/max per group."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "user_id", "ts", "event_id",
        ((F.col("event_id") * 7919) % 36000).alias("ix"),
        ((F.col("event_id") * 104729) % 17000).alias("iy"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = pts.select(
        "user_id", "ts", "event_id",
        (F.col("ix") - F.lag("ix").over(w)).alias("dx"),
        (F.col("iy") - F.lag("iy").over(w)).alias("dy"),
    )
    near = F.when(
        F.col("dx").isNotNull()
        & (F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy") <= 64_000_000),
        1,
    ).otherwise(0)
    flagged = steps.select("user_id", "ts", "event_id", near.alias("near"))
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runs = flagged.select(
        "user_id", "near",
        F.sum(F.when(F.col("near") == 0, 1).otherwise(0)).over(wcum)
        .alias("grp"),
    )
    sized = runs.groupBy("user_id", "grp").agg(
        F.sum("near").cast("long").alias("run_len")
    )
    return (
        sized.groupBy("user_id")
        .agg(
            F.count_if(F.col("run_len") >= 3).alias("n_staypoints"),
            F.coalesce(F.max("run_len"), F.lit(0)).cast("long")
            .alias("longest_run"),
        )
        .orderBy("user_id")
    )


@query(
    "g9_trajectory_stats",
    oracle="""
WITH pts AS (
  SELECT user_id, ts, event_id,
         (event_id * 7919) % 36000 AS ix,
         (event_id * 104729) % 17000 AS iy
  FROM events
), steps AS (
  SELECT user_id, ts, event_id, ix, iy,
         ix - lag(ix) OVER w AS dx,
         iy - lag(iy) OVER w AS dy
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), ends AS (
  SELECT user_id,
         min((ts, event_id, ix, iy)) AS f,
         max((ts, event_id, ix, iy)) AS l
  FROM pts GROUP BY user_id
), agg AS (
  SELECT s.user_id,
         CAST(count(*) AS BIGINT) AS n_points,
         CAST(sum(CAST(floor(sqrt(CAST(dx * dx + dy * dy AS DOUBLE)))
                  AS BIGINT)) FILTER (WHERE dx IS NOT NULL) AS BIGINT)
           AS path_len,
         CAST(coalesce(max(dx * dx + dy * dy), 0) AS BIGINT) AS max_step2
  FROM steps s GROUP BY s.user_id
)
SELECT a.user_id, a.n_points,
       CAST(coalesce(a.path_len, 0) AS BIGINT) AS path_len,
       a.max_step2,
       CAST(floor(sqrt(CAST((e.l[3] - e.f[3]) * (e.l[3] - e.f[3])
            + (e.l[4] - e.f[4]) * (e.l[4] - e.f[4]) AS DOUBLE)))
            AS BIGINT) AS net_len,
       CAST(CASE WHEN coalesce(a.path_len, 0) > 0
            THEN floor(10000.0
                 * floor(sqrt(CAST((e.l[3] - e.f[3]) * (e.l[3] - e.f[3])
                        + (e.l[4] - e.f[4]) * (e.l[4] - e.f[4]) AS DOUBLE)))
                 / a.path_len)
            ELSE 10000 END AS BIGINT) AS straightness_bp
FROM agg a JOIN ends e ON e.user_id = a.user_id
ORDER BY a.user_id
""",
)
def g9_trajectory_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-trajectory summary statistics — point count, total path
    length, sharpest step, net displacement, and straightness (net /
    path, basis points): the mobility-mining readout next to g8's
    stay points, over the same integer coordinates. Every length is
    floor(sqrt(int)) — sqrt is IEEE correctly-rounded, so the floored
    integer is identical on both engines and the per-user SUM of
    integers is order-free.

    100 TB: one hashpartitioning(user_id) exchange carries the lag
    window and both aggregates; endpoints come from struct min/max on
    the unique (ts, event_id) prefix — no second sort."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("event_id") * 7919) % 36000).alias("ix"),
        ((F.col("event_id") * 104729) % 17000).alias("iy"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = pts.select(
        "user_id",
        "ix",
        "iy",
        (F.col("ix") - F.lag("ix").over(w)).alias("dx"),
        (F.col("iy") - F.lag("iy").over(w)).alias("dy"),
    )
    d2 = F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy")
    agg = steps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.coalesce(
            F.sum(F.floor(F.sqrt(d2.cast("double"))).cast("long")), F.lit(0)
        )
        .cast("long")
        .alias("path_len"),
        F.coalesce(F.max(d2), F.lit(0)).cast("long").alias("max_step2"),
    )
    ends = pts.groupBy("user_id").agg(
        F.min(F.struct("ts", "event_id", "ix", "iy")).alias("f"),
        F.max(F.struct("ts", "event_id", "ix", "iy")).alias("l"),
    )
    ndx = F.col("l.ix") - F.col("f.ix")
    ndy = F.col("l.iy") - F.col("f.iy")
    net = F.floor(F.sqrt((ndx * ndx + ndy * ndy).cast("double"))).cast(
        "long"
    )
    return (
        agg.join(ends, "user_id")
        .select(
            "user_id",
            "n_points",
            "path_len",
            "max_step2",
            net.alias("net_len"),
            F.when(
                F.col("path_len") > 0,
                F.floor(F.lit(10000.0) * net / F.col("path_len")),
            )
            .otherwise(F.lit(10000))
            .cast("long")
            .alias("straightness_bp"),
        )
        .orderBy("user_id")
    )
