#!/usr/bin/env python
"""Index-lifecycle scaling probe (round 15): commit / serve / append
walls and store bytes at x1 vs x10 vectors (the ann_recall_10x ripple
replicas), books and knobs fixed at the registered m=4 x k=256 x
nprobe=14 shape with n_centroids scaled 16 -> 160 at x10 (the
graph_recall_economics sizing rule). Reports, per scale:
  commit_s (train excluded - it is coarse_trainer_r14's row), bytes on
  disk, serve_s (min-of-3 from the committed store), append_s for a 5%
  delta, delta_bytes.
Usage: python tools/index_lifecycle_probe.py
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyspark.sql.functions as F

from recipes_spark.io import load, scale_partitions
from recipes_spark.operators.similarity import (
    ivf_pq_search_coded,
    train_coarse_centroids_int,
    train_pq_codebooks_int,
)
from recipes_spark.plans.ann_index import (
    ann_index_append,
    ann_index_codes,
    ann_index_commit,
    ann_index_load_books,
)
from recipes_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def du(path):
    total = 0
    for dirpath, _d, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(dirpath, fn))
    return total


def replicated(spark, emb, reps, dim=64):
    if reps == 1:
        return emb
    import hashlib

    parts = [emb]
    n = emb.count()
    for r in range(1, reps):
        ripple = [
            1.0
            + (
                (
                    int(
                        hashlib.sha256(f"rep:{r}:{j}".encode()).hexdigest()[
                            :15
                        ],
                        16,
                    )
                    % 2001
                )
                - 1000
            )
            / 100000.0
            for j in range(dim)
        ]
        rip = F.array(*[F.lit(x) for x in ripple])
        parts.append(
            emb.select(
                (F.col("vec_id") + r * n).alias("vec_id"),
                F.zip_with(
                    F.transform("embedding", lambda x: x.cast("double")),
                    rip,
                    lambda a, b: (a * b).cast("float"),
                ).alias("embedding"),
            )
        )
    out = parts[0].select("vec_id", "embedding")
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint(eager=True)


def main():
    spark = get_session(
        "index-lifecycle", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    spark.sparkContext.setLogLevel("ERROR")
    base_emb = load(spark, SF, "embeddings").select("vec_id", "embedding")
    for reps, kc in ((1, 16), (10, 160)):
        emb = scale_partitions(replicated(spark, base_emb, reps))
        n = emb.count()
        cents = train_coarse_centroids_int(
            emb, k=kc, iters=3, hash_tag="pq:0"
        )
        books = train_pq_codebooks_int(emb, m=4, k=256)
        store = tempfile.mkdtemp(prefix="recipes_idx_probe_")
        try:
            t0 = time.perf_counter()
            ann_index_commit(spark, emb, store, 1, cents, books, code_bits=8)
            commit_s = time.perf_counter() - t0
            bytes_v1 = du(os.path.join(store, "codes"))
            coarse_l, books_l = ann_index_load_books(spark, store)
            coded = ann_index_codes(spark, store, 1)
            queries = emb.filter(F.col("vec_id") < 5).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            )
            serve = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                ivf_pq_search_coded(
                    coded, emb, queries, coarse_l, books_l,
                    k=10, nprobe=14, refine=16, code_bits=8,
                ).write.format("noop").mode("overwrite").save()
                serve = min(serve, time.perf_counter() - t0)
            delta = emb.filter(F.pmod("vec_id", F.lit(20)) == 0).select(
                (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
            )
            t0 = time.perf_counter()
            ann_index_append(spark, delta, store, 2, code_bits=8)
            append_s = time.perf_counter() - t0
            delta_bytes = du(os.path.join(store, "codes")) - bytes_v1
            print(
                {
                    "reps": reps,
                    "n_vecs": n,
                    "n_centroids": kc,
                    "commit_s": round(commit_s, 2),
                    "index_bytes": bytes_v1,
                    "serve_s": round(serve, 2),
                    "append_s": round(append_s, 2),
                    "delta_bytes": delta_bytes,
                },
                flush=True,
            )
        finally:
            shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
