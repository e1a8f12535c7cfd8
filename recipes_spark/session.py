"""SparkSession factory tuned for the engine.

Scale notes (100 TB design):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast conversion replace hand-tuned partition counts.
- Arrow on: every pandas-UDF island (NetCDF decode, geometry simplify)
  moves batches, not rows.
- shuffle.partitions here is a local-mode default; on a real cluster AQE
  re-plans from `spark.sql.adaptive.coalescePartitions.initialPartitionNum`
  so the static number only caps the initial fan-out.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_LOCAL_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def configure(builder: SparkSession.Builder) -> SparkSession.Builder:
    """Apply engine defaults to any builder (used for both local tests and
    cluster submission — only settings that are safe in both)."""
    return (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )


def get_session(app_name: str = "recipes-spark", cpus: str | None = None) -> SparkSession:
    """Local-mode session for tests and bench (local[N], N from
    $SPARK_GRAFT_CPUS). On a cluster, callers pass their own session."""
    n = cpus or DEFAULT_LOCAL_CPUS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", n)
        # 24g (was 8g): in local mode the driver heap IS the executor
        # heap for all N threads; at 8g the 16-query bench hit GC
        # pressure in its back half (st2/x2 2x inflated, position-
        # dependent) — 24g measured 12.0s vs 15.7s total, every query
        # at or under its best. Cluster deployments size executors
        # instead (SCALE.md "Knobs").
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    builder = configure(builder)
    # Deployment-specific conf pass-through (JSON object), applied LAST
    # so it can override the local defaults above: cluster submissions
    # and tuning A/Bs set e.g. advisory partition size or compression
    # codec without code edits. Unset (the default, and the bench/driver
    # condition) this is a no-op.
    extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    if extra:
        import json

        for k, v in json.loads(extra).items():
            builder = builder.config(k, _conf_value(v))
    return builder.getOrCreate()


def _conf_value(v) -> str:
    """Render one SPARK_GRAFT_EXTRA_CONF JSON value as the conf string
    Spark parses. Non-string values serialize back through json.dumps:
    str() would turn false/null into "False"/"None", which Spark's
    conf parser rejects (null) or only accepts by case-insensitivity
    accident (booleans) — r16 ADVICE."""
    import json

    return v if isinstance(v, str) else json.dumps(v)
