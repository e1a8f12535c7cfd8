"""Query catalog — importing this package registers every query with
recipes_spark.registry (name → (spark, sf_dir) -> DataFrame, plus DuckDB
oracle SQL where the operator is SQL-expressible)."""

from recipes_spark.queries import (  # noqa: F401
    corpus_ops,
    dataops,
    events,
    geometry,
    manifest,
    multimodal,
    pipeline,
    reference_io,
    relational,
    stac,
    tpch_extra,
)
from recipes_spark.streaming import (  # noqa: F401
    ingest,
    queries as streaming_queries,
    stateful,
)
