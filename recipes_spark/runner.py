"""Config-driven pipeline runner — the engine's `python recipe.py
runtime-config.yaml` (SURVEY §3.1-3.2 lifecycle).

The reference's entry point parses a YAML runtime config (pgstac DSN +
cache_root, avhrr…/recipe.py:141-154 / runtime-config.yaml:1-4), commits
collections FIRST (FK-parent barrier, recipe.py:159-166), then builds
the item pipeline and sinks to pgstac. The engine keeps that lifecycle
with its own stores: `catalog.path` replaces the DSN (partitioned
Parquet instead of Postgres — capability, not wire parity), `cache_root`
memoizes discovery exactly like cached_glob (insitu…/recipe.py:30-45),
and both phases stay two separate Spark actions so collections are
durable before any item commits.

Run:  python -m recipes_spark.runner path/to/config.yaml

Config:
    catalog:
      path: /data/catalog          # items → {path}/items, collections → {path}/collections
    cache_root: /data/cache        # listing memoization (optional)
    collections: collections.yaml  # multi-doc yaml (S9)
    granules: "/data/landing/*.nc" # discovery glob (S5/S6)
    storage_kwargs: {...}          # optional per-FS auth/options — the
                                   # reference's open_kwargs=storage_kwargs
                                   # pass-through (avhrr…/recipe.py:124,154),
                                   # fed to the executor-side filesystem
    xstac_kwargs:                  # optional projection metadata — the
      reference_system: epsg:4326  # reference's CreateStacItem xstac_kwargs
      x_dimension: lon             # (avhrr…/recipe.py:128-136); emits
      y_dimension: lat             # proj:epsg + cube:dimensions on items
    database:                      # optional DB sink ALONGSIDE the parquet
      kind: sqlite                 # store — the ToPgStac-shaped path
      path: /data/catalog.db       # (docker-compose.yml:30-44); 'sqlite'
      items_table: items           # ships in-tree, Postgres = same dialect
                                   # via a psycopg2 connection factory
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from recipes_spark.plans.catalog import upsert_items
from recipes_spark.plans.items import build_items
from recipes_spark.sources.granules import file_metadata
from recipes_spark.sources.listing import cached_glob, read_collections_yaml


def run_pipeline(spark: SparkSession, config: str | dict) -> dict[str, int]:
    """Execute the full ingest lifecycle from a runtime config. Returns
    {"collections": n, "files": n, "items": n}. Idempotent: re-running
    with the same config leaves both stores unchanged (upsert-by-id on
    both phases — ToPgStac re-run semantics, SURVEY §4.1)."""
    if isinstance(config, str):
        import yaml

        with open(config) as fh:
            config = yaml.safe_load(fh)
    catalog = config["catalog"]["path"]

    # Phase 1 — collections commit BEFORE any item work (the reference's
    # two-pipeline barrier): a separate action whose write completes here.
    cols = read_collections_yaml(spark, config["collections"]).withColumn(
        "collection_id", F.col("id")
    )
    upsert_items(spark, cols, f"{catalog}/collections")
    n_cols = spark.read.parquet(f"{catalog}/collections").count()

    # Phase 2 — discovery (memoized when cache_root given) → metadata →
    # item assembly → idempotent upsert.
    pattern = config["granules"]
    cache_root = config.get("cache_root")
    storage_kwargs = config.get("storage_kwargs")
    if cache_root:
        listing = cached_glob(
            spark, pattern, cache_root=cache_root,
            storage_kwargs=storage_kwargs,
        )
    else:
        from recipes_spark.sources.listing import glob_listing

        listing = glob_listing(
            spark, [pattern], storage_kwargs=storage_kwargs
        ).select("url")
    n_files = listing.count()

    meta = file_metadata(spark, pattern).select(
        F.col("granule_id").alias("item_id"),
        F.concat_ws("-", F.lit("sst"), F.col("platform")).alias("collection_id"),
        "west",
        "south",
        "east",
        "north",
        "start_datetime",
        "end_datetime",
        F.col("source").alias("source_url"),
    )
    items = build_items(meta, projection=config.get("xstac_kwargs"))
    upsert_items(spark, items, f"{catalog}/items")
    n_items = spark.read.parquet(f"{catalog}/items").count()

    # Optional database sink alongside the parquet store — the
    # reference's actual sink shape (ToPgStac → pgstac JSONB upsert).
    # Idempotent like everything above: ON CONFLICT by id.
    db = config.get("database")
    if db:
        if db.get("kind", "sqlite") != "sqlite":
            raise ValueError(
                "runner ships the sqlite kind in-tree; for Postgres pass "
                "a psycopg2 connection factory to "
                "plans.db_sink.upsert_items_to_database directly"
            )
        import functools
        import sqlite3

        from recipes_spark.plans.db_sink import upsert_items_to_database

        table = db.get("items_table", "items")
        con = sqlite3.connect(db["path"])
        con.execute(
            f'CREATE TABLE IF NOT EXISTS "{table}" (id TEXT PRIMARY KEY,'
            " collection_id TEXT, content TEXT)"
        )
        con.commit()
        con.close()
        upsert_items_to_database(
            items,
            connect=functools.partial(sqlite3.connect, db["path"], 60),
            table=table,
        )
    return {"collections": n_cols, "files": n_files, "items": n_items}


def main(argv: list[str] | None = None) -> None:
    import argparse

    from recipes_spark.session import get_session

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", help="runtime config yaml")
    args = ap.parse_args(argv)
    spark = get_session("recipes-spark-runner")
    counts = run_pipeline(spark, args.config)
    print(counts)


if __name__ == "__main__":
    main()
