"""Similarity search over embedding columns (SURVEY.md §2.12 X3):
brute-force cosine top-k as the exact baseline, and a random-hyperplane
LSH bucketed variant as the 100 TB scale path.

Scale design: brute-force is a broadcast of the (small) query set against
the corpus — no corpus shuffle, embarrassingly parallel, O(Q·N·d) compute
kept JVM-side via zip_with/aggregate. The LSH variant buckets the corpus
once (row-local sign-bit sketch), then probes only matching buckets —
turning top-k into an equi-join, the same banding trick as MinHash.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from recipes_spark.functions.vectors import as_double, cosine
from recipes_spark.io import scale_partitions


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set, cross join, window
    top-k per query. Deterministic tiebreak on (rounded sim desc, id)."""
    joined = scale_partitions(corpus).crossJoin(F.broadcast(queries)).withColumn(
        "cosine_sim",
        F.round(cosine(as_double(F.col(vec_col)), as_double(F.col(query_vec_col))), 4),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_sim"), F.col(id_col)
    )
    return (
        joined.filter(F.col(id_col) != F.col(query_id_col))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rank")
    )


def hyperplane_sketch(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-bit sketch: bit_j = 1 iff vec·plane_j > 0. planes is a
    (n_planes, dim) literal matrix (deterministic seed) folded into the
    plan as array literals — row-local, no shuffle."""
    bits = []
    for row in planes:
        plane = F.array(*[F.lit(float(x)) for x in row])
        d = F.aggregate(
            F.zip_with(vec_col, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(d > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: `n_tables` independent hyperplane sketches;
    candidates = corpus rows sharing a bucket with the query in ANY
    table; exact cosine re-rank on candidates only. Recall grows with
    n_tables; bucket fan-out is 2^n_planes per table."""
    rng = np.random.default_rng(seed)
    tables = [rng.standard_normal((n_planes, dim)) for _ in range(n_tables)]

    def bucketed(df: DataFrame, vcol: str, idcols: list[str]) -> DataFrame:
        vec = as_double(F.col(vcol))
        buckets = F.array(
            *[
                F.concat(F.lit(f"t{t}:"), hyperplane_sketch(vec, planes))
                for t, planes in enumerate(tables)
            ]
        )
        return df.select(*idcols, vcol, F.explode(buckets).alias("bucket"))

    cb = bucketed(scale_partitions(corpus), vec_col, [id_col])
    qb = bucketed(queries, query_vec_col, [query_id_col])
    cand = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col(id_col) != F.col(query_id_col))
        .dropDuplicates([query_id_col, id_col])
        .withColumn(
            "cosine_sim",
            F.round(
                cosine(as_double(F.col(vec_col)), as_double(F.col(query_vec_col))), 4
            ),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine_sim"), F.col(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rank")
    )
