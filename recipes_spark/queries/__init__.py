"""Query catalog — importing this package registers every query with
recipes_spark.registry (name → (spark, sf_dir) -> DataFrame, plus DuckDB
oracle SQL where the operator is SQL-expressible)."""

# Import order = registration order = the order the correctness driver
# samples queries in (it checks a bounded prefix per round). Keep the
# suites still awaiting driver attestation ahead of the long-verified ones;
# registry.all_queries() additionally floats unattested names to the front.
from recipes_spark.queries import (  # noqa: F401
    relational,
    stac,
)
from recipes_spark.streaming import (  # noqa: F401
    ingest,
    queries as streaming_queries,
    stateful,
)
from recipes_spark.queries import (  # noqa: F401
    reference_io,
    tpch_extra,
    corpus_ops,
    dataops,
    events,
    geometry,
    manifest,
    merge_ops,
    multimodal,
    pipeline,
)
