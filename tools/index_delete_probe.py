#!/usr/bin/env python
"""Measure the index-DELETE economics (round 16): the claim in
plans/ann_index.ann_index_delete is cost ∝ touched cells' rows, never
index size. Protocol mirrors index_lifecycle_10x: commit the flagship
index at ×1 (the sf0.1 corpus) and ×10 (id-shifted ripple replicas,
n_centroids scaled with the corpus — the graph_recall_economics
sizing rule), then delete a FIXED 100-id tombstone set and measure
(a) the delete wall, (b) new bytes written vs bytes carried by
reference, (c) the touched-cell fraction. A second leg deletes a
PROPORTIONAL 5% set so both scaling regimes are priced.

Usage: python tools/index_delete_probe.py   (one dict per line)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from recipes_spark.io import load
from recipes_spark.operators.similarity import (
    pq_encode_int,
    train_coarse_centroids_int,
    train_pq_codebooks_int,
)
from recipes_spark.plans.ann_index import ann_index_commit, ann_index_delete
from recipes_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                total += os.path.getsize(os.path.join(dirpath, fn))
    return total


def main():
    import shutil
    import tempfile

    spark = get_session(
        "delete-probe", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = load(spark, SF, "embeddings")
    n1 = base.count()
    for mult, k_cells in ((1, 16), (10, 160)):
        emb = base
        if mult > 1:
            # id-shifted replicas with a ±1‰ deterministic ripple so
            # replicas land in nearby-but-not-identical cells
            reps = [base]
            for r in range(1, mult):
                reps.append(
                    base.select(
                        (F.col("vec_id") + r * n1).alias("vec_id"),
                        F.transform(
                            "embedding",
                            lambda x: x * (1.0 + 0.001 * ((r % 3) - 1)),
                        ).alias("embedding"),
                        "label",
                    )
                )
            emb = reps[0]
            for df in reps[1:]:
                emb = emb.unionByName(df)
            emb = emb.localCheckpoint(eager=True)
        n = emb.count()
        cents = train_coarse_centroids_int(
            emb, k=k_cells, iters=3, hash_tag="pq:0"
        )
        books = train_pq_codebooks_int(emb, m=4, k=256)
        coded = pq_encode_int(
            emb, books, coarse_milli=cents, code_bits=8
        ).localCheckpoint(eager=True)
        hottest = (
            coded.groupBy("__list")
            .count()
            .orderBy(F.col("count").desc())
            .first()["__list"]
        )
        for kind, n_tomb in (
            ("fixed100", 100),
            ("pct5", n // 20),
            ("onecell100", 100),
        ):
            store = tempfile.mkdtemp(prefix=f"del_probe_{mult}x_{kind}_")
            ann_index_commit(
                spark, emb, store, 1, cents, books, code_bits=8,
                coded=coded,
            )
            codes_root = os.path.join(store, "codes", "data")
            v1_bytes = dir_bytes(codes_root)
            if kind == "onecell100":
                # a real dedup cluster co-locates: all tombstones in
                # the (hottest) single cell — the carried-by-reference
                # best case the partial-rewrite commit exists for
                tomb = (
                    coded.filter(F.col("__list") == hottest)
                    .select("vec_id")
                    .orderBy("vec_id")
                    .limit(n_tomb)
                )
            else:
                tomb = spark.range(n_tomb).select(
                    (F.col("id") * (n // n_tomb)).alias("vec_id")
                )
            t0 = time.perf_counter()
            touched = ann_index_delete(spark, store, 2, tomb)
            wall = time.perf_counter() - t0
            new_bytes = dir_bytes(codes_root) - v1_bytes
            print(
                {
                    "mult": mult,
                    "kind": kind,
                    "vectors": n,
                    "cells": k_cells,
                    "tombstones": n_tomb,
                    "touched_cells": len(touched),
                    "delete_wall_s": round(wall, 2),
                    "v1_bytes": v1_bytes,
                    "new_bytes": new_bytes,
                    "carried_by_ref_pct": round(
                        100 * (1 - len(touched) / k_cells), 1
                    ),
                },
                flush=True,
            )
            shutil.rmtree(store, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
