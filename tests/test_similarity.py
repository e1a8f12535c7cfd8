"""Approximate-ANN quality gates (SURVEY.md §5.2 item 2): recall vs the
exact brute-force baseline — the check no row-count smoke test gives."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from recipes_spark.io import load
from recipes_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)


@pytest.fixture(scope="module")
def topk_inputs(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").cache()
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    return emb, queries, exact


def _recall(approx_rows, exact: set) -> float:
    hits = sum(1 for r in approx_rows if (r.query_id, r.vec_id) in exact)
    return hits / len(exact)


def test_lsh_recall(topk_inputs):
    emb, queries, exact = topk_inputs
    got = lsh_topk(emb, queries, k=10).collect()
    r = _recall(got, exact)
    assert r >= 0.5, f"LSH recall@10 {r:.2f} < 0.5"


def test_ivf_recall(topk_inputs):
    emb, queries, exact = topk_inputs
    got = ivf_topk(emb, queries, k=10, n_centroids=16, nprobe=4).collect()
    r = _recall(got, exact)
    assert r >= 0.5, f"IVF recall@10 {r:.2f} < 0.5"


def test_ivf_full_probe_is_exact(topk_inputs):
    """nprobe == n_centroids probes every list — must equal brute force
    exactly (the approximation comes ONLY from list pruning)."""
    emb, queries, exact = topk_inputs
    got = ivf_topk(emb, queries, k=10, n_centroids=8, nprobe=8).collect()
    assert {(r.query_id, r.vec_id) for r in got} == exact
