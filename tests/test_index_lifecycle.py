"""Full index-lifecycle interaction gate (round 16): every verb the
store ships — commit, append, MOR tombstones, delete (fold), compact,
vacuum — interleaved against ONE store, with the membership and
digest invariants checked at every step. The per-verb queries attest
each verb in isolation; this test pins the INTERACTIONS (append after
delete, compact after fold, vacuum fencing with a sidecar present)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from recipes_spark.io import load
from recipes_spark.registry import all_queries  # noqa: F401  (session warm)


def _members(spark, store, version):
    from recipes_spark.plans.ann_index import ann_index_codes

    return {
        int(r["vec_id"])
        for r in ann_index_codes(spark, store, version)
        .select("vec_id")
        .collect()
    }


def test_full_lifecycle_interleaved(spark, sf_dir, tmp_path):
    from recipes_spark.operators.similarity import (
        ivf_pq_search_coded,
        train_coarse_centroids_int,
        train_pq_codebooks_int,
    )
    from recipes_spark.plans.ann_index import (
        ann_index_append,
        ann_index_codes,
        ann_index_codes_live,
        ann_index_commit,
        ann_index_fold_tombstones,
        ann_index_load_books,
        ann_index_meta,
        ann_index_tombstones_commit,
    )
    from recipes_spark.plans.catalog import (
        snapshot_commit,
        snapshot_read,
        snapshot_vacuum,
    )

    emb = load(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 4 != 0)
    delta = emb.filter(F.col("vec_id") % 4 == 0)
    all_ids = {int(r[0]) for r in emb.select("vec_id").collect()}
    base_ids = {i for i in all_ids if i % 4 != 0}
    store = str(tmp_path / "ix")

    # v1: commit the base corpus
    cents = train_coarse_centroids_int(base, k=8, iters=1, hash_tag="pq:0")
    books = train_pq_codebooks_int(base, m=4, k=16, sample=512, iters=2)
    ann_index_commit(spark, base, store, 1, cents, books, code_bits=4)
    assert _members(spark, store, 1) == base_ids
    assert ann_index_meta(spark, store)["code_bits"] == 4

    # v2: append the delta WITHOUT retraining (store-loaded books)
    ann_index_append(spark, delta, store, 2)
    assert _members(spark, store, 2) == all_ids

    # MOR: tombstone every vec_id % 10 == 1 as a sidecar; the live
    # view over v2 must subtract them while v2 itself is untouched
    tomb_ids = {i for i in all_ids if i % 10 == 1}
    tomb = spark.createDataFrame(
        [(i,) for i in sorted(tomb_ids)], "vec_id long"
    )
    ann_index_tombstones_commit(spark, store, 1, tomb)
    live = {
        int(r["vec_id"])
        for r in ann_index_codes_live(spark, store, 2, 1)
        .select("vec_id")
        .collect()
    }
    assert live == all_ids - tomb_ids
    assert _members(spark, store, 2) == all_ids  # v2 untouched

    # v3: FOLD the sidecar (delete after append — tombstones span
    # base files AND delta files)
    touched = ann_index_fold_tombstones(spark, store, 3, 1)
    assert touched
    assert _members(spark, store, 3) == all_ids - tomb_ids
    # time travel: v1/v2 still hold their own membership
    assert _members(spark, store, 1) == base_ids
    assert _members(spark, store, 2) == all_ids

    # v4: COMPACT the whole table (one file per cell) after the fold
    codes_store = os.path.join(store, "codes")
    live_rows = ann_index_codes(spark, store, 3)
    snapshot_commit(
        spark,
        live_rows.select(
            "vec_id",
            "codes_packed",
            F.col("__list").cast("int").alias("cell"),
            F.col("__list").cast("int").alias("cell_key"),
        ).repartition("cell_key"),
        codes_store,
        4,
        replace=True,
        partition_by=("cell_key",),
    )
    assert _members(spark, store, 4) == all_ids - tomb_ids

    # serve equivalence across the fold and the compact
    coarse_l, books_l = ann_index_load_books(spark, store)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    def serve(version):
        return sorted(
            tuple(r)
            for r in ivf_pq_search_coded(
                ann_index_codes(spark, store, version), emb, queries,
                coarse_l, books_l, k=5, nprobe=4, refine=8, code_bits=4,
            ).collect()
        )

    s3, s4 = serve(3), serve(4)
    assert s3 == s4
    assert not {t[1] for t in s4} & tomb_ids

    # VACUUM to the compacted floor: dead v1–v3 files reclaimed,
    # history below fenced loudly, v4 intact
    stats = snapshot_vacuum(spark, codes_store, retain_from=4)
    assert stats["files_deleted"] > 0
    with pytest.raises(Exception):
        snapshot_read(spark, codes_store, 1).count()
    assert _members(spark, store, 4) == all_ids - tomb_ids
    assert serve(4) == s4
