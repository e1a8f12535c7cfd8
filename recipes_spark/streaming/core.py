"""Streaming primitives: stage the events table as a file-source
directory, read it as a stream, run to a memory sink.

Why staging: the driver's events.parquet stores TIMESTAMP(NANOS), which
Spark's (batch or streaming) parquet reader rejects without the
nanosAsLong escape hatch, and a single monolithic file gives the file
source no micro-batch structure. Staging batch-loads through
recipes_spark.io.load (micros conversion applied once) and rewrites as
N files — the stream then exercises real file discovery and, with
maxFilesPerTrigger=1, real multi-batch watermark progression.

Scale note: in production the file source watches a manifest/landing
directory (the reference's hourly-updated HTTP listings, SURVEY §2.10
T1); staging here stands in for that landing zone. Memory sinks are
test-only — production sinks are foreachBatch→upsert (ingest.py) or
kafka/parquet sinks.
"""

from __future__ import annotations

import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from recipes_spark.io import load

_STAGED: dict[tuple[str, int, int], str] = {}
#: Memoized recursive byte totals of staged dirs (immutable once
#: written) — read by adaptive_state_partitions at every stream start.
_STAGED_BYTES: dict[str, int] = {}
_IDS = itertools.count()


def stage_events(
    spark: SparkSession, sf_dir: str, *, files: int = 4, copies: int = 1
) -> str:
    """Rewrite events as `files` parquet files per copy under a temp dir;
    memoized per (sf_dir, files, copies). With copies=2 every event_id
    appears twice (dedup-operator input). File mtimes are forced into
    write order so latestFirst=false reads them deterministically."""
    key = (sf_dir, files, copies)
    if key in _STAGED and os.path.isdir(_STAGED[key]):
        return _STAGED[key]
    root = tempfile.mkdtemp(prefix="recipes_stream_events_")
    ev = load(spark, sf_dir, "events")
    for copy in range(copies):
        part = os.path.join(root, f"copy{copy}")
        ev.repartition(files).write.mode("overwrite").parquet(part)
        for i, name in enumerate(sorted(os.listdir(part))):
            if name.endswith(".parquet"):
                t = 1_600_000_000 + copy * 1000 + i
                os.utime(os.path.join(part, name), (t, t))
    _STAGED[key] = root
    return root


def stage_events_ordered(
    spark: SparkSession, sf_dir: str, *, chunks: int = 4
) -> str:
    """Stage events as `chunks` files split along the GLOBAL
    (ts, event_id) order — file i holds rows strictly before file i+1.
    This is the in-order-delivery contract a CDC apply stream assumes
    (change batches arrive in commit order); mtimes force the file
    source to read them in that order. Memoized like stage_events."""
    key = (sf_dir, -1, chunks)
    if key in _STAGED and os.path.isdir(_STAGED[key]):
        return _STAGED[key]
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    root = tempfile.mkdtemp(prefix="recipes_stream_cdc_")
    ev = load(spark, sf_dir, "events")
    # ntile over the global order: small table at test scale; a real
    # landing zone is written pre-chunked by the upstream producer.
    w = Window.orderBy("ts", "event_id")
    chunked = ev.withColumn("__chunk", F.ntile(chunks).over(w))
    for i in range(1, chunks + 1):
        part = os.path.join(root, f"chunk{i:03d}.parquet")
        chunked.filter(F.col("__chunk") == i).drop("__chunk").coalesce(
            1
        ).write.mode("overwrite").parquet(part)
        t = 1_600_000_000 + i
        os.utime(part, (t, t))
        for name in os.listdir(part):
            os.utime(os.path.join(part, name), (t, t))
    _STAGED[key] = root
    return root


def stage_ordered(dfs, *, prefix: str) -> str:
    """Write each DataFrame as one single-file parquet chunk with
    strictly increasing mtimes, so a latestFirst=false file-source
    stream delivers them as in-order micro-batches (one per file with
    maxFilesPerTrigger=1). The shared landing-zone stager for the
    incremental dedup/near-dup queries (st11/st12)."""
    root = tempfile.mkdtemp(prefix=prefix)
    for i, df in enumerate(dfs):
        part = os.path.join(root, f"chunk{i:03d}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(part)
        t = 1_600_000_000 + i
        os.utime(part, (t, t))
        for name in os.listdir(part):
            os.utime(os.path.join(part, name), (t, t))
    return root


def stream_events(
    spark: SparkSession,
    sf_dir: str,
    *,
    files: int = 4,
    copies: int = 1,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """events as a file-source stream with the batch schema."""
    staged = stage_events(spark, sf_dir, files=files, copies=copies)
    schema = load(spark, sf_dir, "events").schema
    reader = (
        spark.readStream.schema(schema)
        .option("latestFirst", "false")
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(staged)


#: Target bytes of staged source per state-store partition. Stateful
#: operators fix their state-partition count at stream start from
#: spark.sql.shuffle.partitions — AQE cannot coalesce streaming state —
#: so a constant tuned for the cluster (or for local core count) is
#: wrong at every other scale. Derive it from the staged input size
#: instead: each HDFSBackedStateStore commit writes+fsyncs a delta file
#: per partition per micro-batch, which at test scale (a few MB of
#: events feeding 32 stores) was 80% of the micro-batch's state commit
#: time (measured round 16: summed commitTimeMs 4687 ms -> 409 ms at 8
#: partitions, st2 wall 0.90 s -> 0.59 s).
_STATE_PARTITION_TARGET_BYTES = 32 << 20


def adaptive_state_partitions(spark: SparkSession) -> int:
    """Scale-adaptive state-partition count for the memory-sink harness
    streams: staged-source bytes / 32 MB, floor 8, capped at
    max(session shuffle partitions, 2048). Override with
    SPARK_GRAFT_STREAM_STATE_PARTITIONS (production clusters size state
    partitions to state volume and executor count explicitly)."""
    env = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS")
    if env:
        return max(1, int(env))
    total = 0
    for path in _STAGED.values():
        # Staged dirs are immutable once written (stage_* force mtimes
        # and never rewrite), so the byte total is memoized per path —
        # this runs at EVERY stream start and an os.walk per start is
        # avoidable fixed cost (r16 verdict housekeeping).
        cached = _STAGED_BYTES.get(path)
        if cached is None:
            cached = 0
            for dirpath, _dirs, files in os.walk(path):
                for f in files:
                    try:
                        cached += os.path.getsize(os.path.join(dirpath, f))
                    except OSError:
                        pass
            _STAGED_BYTES[path] = cached
        total += cached
    current = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n = max(8, -(-total // _STATE_PARTITION_TARGET_BYTES))
    return min(n, max(current, 2048))


def run_to_memory(
    sdf: DataFrame, *, output_mode: str, name_hint: str = "stream"
) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into a
    uniquely-named memory sink; return the sink as a batch DataFrame.

    State partitions are sized adaptively (see above); results are
    partition-count-independent — aggregation/join/dedup semantics key
    on data values and watermarks advance globally — so this changes
    commit cost only, never the sunk rows."""
    spark = sdf.sparkSession
    name = f"{name_hint}_{next(_IDS)}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", adaptive_state_partitions(spark)
    )
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def cleanup_staged() -> None:
    for path in _STAGED.values():
        shutil.rmtree(path, ignore_errors=True)
    _STAGED.clear()
    _STAGED_BYTES.clear()
