"""T1: incremental file ingest with an idempotent upsert sink.

The reference's incremental story is "re-run the pipeline, pgstac
upserts by id" (ToPgStac, avhrr…/recipe.py:85,137 — SURVEY §2.10 T1,
§4.1). Streaming-native form: a file-source stream over the landing
directory, foreachBatch → upsert-by-key into a partitioned parquet
catalog. Every micro-batch is a transactional-enough unit: re-delivery
of a batch (at-least-once file source) cannot duplicate rows because
the upsert anti-joins on the key.

Scale notes: the per-batch rewrite touches only partitions present in
the batch (dynamic partition overwrite); at 100 TB the store would be
Delta/Iceberg MERGE, but the capability — idempotent incremental load —
is identical.
"""

from __future__ import annotations

import itertools
import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from recipes_spark.registry import query
from recipes_spark.streaming.core import stream_events

_IDS = itertools.count()


def upsert_batch(
    batch: DataFrame, path: str, *, key: str, partition_col: str
) -> None:
    """Idempotent keyed upsert into a parquet store partitioned by
    `partition_col`. New rows win; only touched partitions rewrite."""
    spark = batch.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    fresh = batch.dropDuplicates([key])
    try:
        existing = spark.read.parquet(path)
        touched = [
            r[0] for r in fresh.select(partition_col).distinct().collect()
        ]
        keep = existing.filter(F.col(partition_col).isin(touched)).join(
            fresh.select(key), key, "left_anti"
        )
        out = fresh.unionByName(keep)
    except Exception:  # first batch: store does not exist yet
        out = fresh
    out.localCheckpoint(eager=True).write.mode("overwrite").partitionBy(
        partition_col
    ).parquet(path)


def ingest_events(
    spark: SparkSession,
    sf_dir: str,
    catalog_path: str,
    *,
    max_files_per_trigger: int | None = 2,
) -> None:
    """Run the landing-zone stream to completion, upserting each
    micro-batch into `catalog_path` keyed by event_id."""
    ev = stream_events(
        spark, sf_dir, max_files_per_trigger=max_files_per_trigger
    )
    q = (
        ev.writeStream.foreachBatch(
            lambda bdf, _bid: upsert_batch(
                bdf, catalog_path, key="event_id", partition_col="event_type"
            )
        )
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix="recipes_ingest_ckpt_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()


@query(
    "st10_cdc_merge",
    oracle="""
WITH ranked AS (
  SELECT user_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_type AS last_event_type, ts AS last_ts,
       value AS last_value
FROM ranked WHERE rn = 1
""",
)
def st10_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply: a change stream (events in commit order,
    chunked into in-order micro-batches) merged into a keyed store via
    foreachBatch → MERGE INTO (plans/merge.py) — the plain-Parquet
    analog of a Delta/Iceberg streaming MERGE. Each batch reduces to
    its last change per key (row_number over ts desc, event_id desc)
    before merging, so re-delivery of a batch is idempotent and the
    final store is the last-writer-wins state per user — which is the
    oracle: latest event per user over the whole table. In-order
    delivery is the standard CDC-apply contract; the chunking preserves
    global (ts, event_id) order across batch boundaries.

    Scale shape: per batch, one narrow (key, partition) scan of the
    target + a rewrite of touched partitions only (user_id hash-bucket
    partitioning spreads rewrites evenly); the store never rescans the
    stream history."""
    from pyspark.sql import Window

    from recipes_spark.plans.merge import merge_into
    from recipes_spark.streaming.core import stage_events_ordered

    staged = stage_events_ordered(spark, sf_dir, chunks=4)
    store = tempfile.mkdtemp(prefix="recipes_cdc_store_") + "/store"
    schema = (
        spark.read.parquet(os.path.join(staged, "chunk001.parquet")).schema
    )

    def apply_cdc(bdf: DataFrame, _bid: int) -> None:
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        latest = (
            bdf.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                "user_id",
                "ts",
                "event_type",
                "value",
                F.pmod("user_id", F.lit(8)).cast("int").alias("bucket"),
            )
        )
        merge_into(
            spark, store, latest, on="user_id", partition_col="bucket",
            when_matched="update", when_not_matched="insert",
        )

    q = (
        spark.readStream.schema(schema)
        .option("latestFirst", "false")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
        .writeStream.foreachBatch(apply_cdc)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="recipes_cdc_ckpt_")
        )
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    return spark.read.parquet(store).select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("ts").alias("last_ts"),
        F.col("value").alias("last_value"),
    )


@query(
    "st1_incremental_ingest",
    oracle="""
SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def st1_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1+S12: multi-batch incremental ingest (2 files per trigger) into
    a fresh catalog, then aggregate the catalog. Upsert-by-key makes the
    result independent of batch boundaries — it must equal a plain
    per-type aggregate of the source, which is the oracle."""
    catalog = tempfile.mkdtemp(prefix="recipes_ingest_catalog_") + "/store"
    ingest_events(spark, sf_dir, catalog)
    return (
        spark.read.parquet(catalog)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )
