"""G1/G2 geometry queries (SURVEY.md §2.9): trajectory extraction +
simplification over per-user event trajectories, and the pure-SQL
trajectory bbox the oracle CAN check."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from recipes_spark.io import load
from recipes_spark.operators.geometry import (
    extract_geometry,
    trajectories_from_events,
)
from recipes_spark.registry import query


@query("g1_trajectory_simplify")
def g1_trajectory_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 (insitu…/recipe.py:91-93): per-platform trajectory → Point or
    Douglas-Peucker LineString (tolerance 0.5°). Rows-only check — no
    SQL equivalent exists for DP simplification; the tolerance/subset/
    endpoint properties are asserted in tests/test_geometry.py."""
    ev = load(spark, sf_dir, "events")
    traj = trajectories_from_events(ev)
    return (
        traj.select(
            "user_id",
            extract_geometry("lon", "lat", tolerance=0.5).alias("g"),
        )
        .select(
            "user_id",
            F.col("g.geom_type").alias("geom_type"),
            F.col("g.n_in").alias("n_in"),
            F.col("g.n_out").alias("n_out"),
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
