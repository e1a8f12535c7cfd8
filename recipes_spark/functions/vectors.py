"""Vector math over ARRAY<FLOAT>/ARRAY<DOUBLE> columns — pure Catalyst
(zip_with + aggregate), no UDFs, so similarity search stays JVM-side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def as_double(col: str | Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ — sequential fold, same summation order as DuckDB's
    list_dot_product so results are bit-comparable."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
