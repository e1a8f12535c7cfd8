"""Config-driven runner (SURVEY §3.1-3.2): the reference's
`python recipe.py runtime-config.yaml` lifecycle — collections-first
barrier, memoized discovery, item assembly, idempotent upsert."""

from __future__ import annotations

import os
import tempfile

import yaml

from recipes_spark.runner import run_pipeline
from recipes_spark.sources.granules import stage_granules


def _config(tmp: str) -> dict:
    return {
        "catalog": {"path": f"{tmp}/catalog"},
        "cache_root": f"{tmp}/cache",
        "collections": "recipes_spark/resources/collections.yaml",
        "granules": stage_granules(12) + "/*.nc",
    }


def test_runner_end_to_end_and_idempotent(spark):
    tmp = tempfile.mkdtemp(prefix="recipes_runner_")
    cfg = _config(tmp)
    first = run_pipeline(spark, cfg)
    assert first["collections"] > 0
    assert first["files"] == 12
    assert first["items"] == 12
    # Discovery memoized: the sha256-keyed manifest parquet exists.
    assert os.listdir(cfg["cache_root"])
    # Re-run = no-op on both stores (ToPgStac re-run semantics).
    second = run_pipeline(spark, cfg)
    assert second == first


def test_runner_from_yaml_file(spark):
    tmp = tempfile.mkdtemp(prefix="recipes_runner_yaml_")
    path = f"{tmp}/config.yaml"
    with open(path, "w") as fh:
        yaml.safe_dump(_config(tmp), fh)
    counts = run_pipeline(spark, path)
    assert counts["items"] == 12 and counts["collections"] > 0


def test_runner_xstac_and_database_sink(spark):
    """Round-8 config surface: xstac_kwargs lands proj:epsg +
    cube:dimensions on every stored item, and the optional database
    block sinks the same items into a sqlite table (the ToPgStac-shaped
    path) — idempotently, like the parquet store."""
    import sqlite3

    import pyspark.sql.functions as F

    tmp = tempfile.mkdtemp(prefix="recipes_runner_db_")
    cfg = _config(tmp)
    cfg["xstac_kwargs"] = {
        "reference_system": "epsg:4326",
        "x_dimension": "ni",
        "y_dimension": "nj",
    }
    cfg["database"] = {"kind": "sqlite", "path": f"{tmp}/catalog.db"}
    first = run_pipeline(spark, cfg)
    assert first["items"] == 12

    stored = spark.read.parquet(f"{tmp}/catalog/items")
    projs = stored.select(
        F.col("properties").getField("proj:epsg").alias("e"),
        F.col("properties").getField("cube:dimensions").alias("cube"),
    ).collect()
    assert all(r["e"] == 4326 and '"ni"' in r["cube"] for r in projs)

    def db_rows():
        con = sqlite3.connect(f"{tmp}/catalog.db")
        try:
            return sorted(con.execute("SELECT * FROM items").fetchall())
        finally:
            con.close()

    rows = db_rows()
    assert len(rows) == 12
    import json

    doc = json.loads(rows[0][2])
    assert doc["properties"]["proj:epsg"] == 4326
    assert run_pipeline(spark, cfg) == first  # rerun: both sinks no-op
    assert db_rows() == rows
