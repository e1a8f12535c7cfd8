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
