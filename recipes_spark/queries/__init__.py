"""Query catalog — importing this package registers every query with
recipes_spark.registry (name → (spark, sf_dir) -> DataFrame, plus DuckDB
oracle SQL where the operator is SQL-expressible)."""

from recipes_spark.queries import (  # noqa: F401
    dataops,
    events,
    manifest,
    relational,
    stac,
    tpch_extra,
)
