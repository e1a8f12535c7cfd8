"""Structured Streaming surface (SURVEY.md §2.10 T1–T6).

The reference is batch-only but near-real-time by design (hourly-updated
products, open-ended temporal extents, idempotent upsert re-runs —
insitu…/collections.yaml:3, avhrr…/collections.yaml:9, ToPgStac S12).
This package is the streaming-native form of that surface: file-source
incremental ingest, watermarked window aggregation, and stateful dedup.
"""

from recipes_spark.streaming.core import (  # noqa: F401
    run_to_memory,
    stage_events,
    stream_events,
)
