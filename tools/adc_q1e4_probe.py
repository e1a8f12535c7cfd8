#!/usr/bin/env python
"""Push the ADC probe-table comparison to Q~=10^4 (r15 verdict task
5): SCALE.md adc_probe_table_crossover honestly recorded no local
crossover by Q=10^3 — this probe runs the batch size the table side
EXISTS for (literal payload ~1.1 GB of plan literals at the
registered m=4 x k=256 x nprobe=14 knobs, past any defensible
broadcast) and records where the table side actually wins, or the
memory/GC wall the literal side hits first.

Queries beyond the corpus size are replicas with shifted query_ids —
a wall-clock measurement needs Q rows, not Q distinct vectors (the
per-query tables are what scale, and replicas produce identical
per-query work).

Usage: python tools/adc_q1e4_probe.py   (writes one dict per line)
"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from recipes_spark.io import load
from recipes_spark.operators.similarity import (
    ivf_pq_search_coded,
    pq_encode_int,
    train_coarse_centroids_int,
    train_pq_codebooks_int,
)
from recipes_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = get_session(
        "adc-q1e4", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = load(spark, SF, "embeddings")
    n = emb.count()
    cents = train_coarse_centroids_int(emb, k=16, iters=3, hash_tag="pq:0")
    books = train_pq_codebooks_int(emb, m=4, k=256)
    coded = (
        pq_encode_int(emb, books, coarse_milli=cents, code_bits=8)
        .select("vec_id", "codes_packed", "__list")
        .localCheckpoint(eager=True)
    )
    coded.count()
    for q in (2000, 5000, 10000):
        reps = -(-q // n)
        queries = (
            emb.crossJoin(
                spark.range(reps).select(F.col("id").alias("__rep"))
            )
            .select(
                (F.col("vec_id") + F.col("__rep") * n).alias("query_id"),
                F.col("embedding").alias("query_vec"),
            )
            .filter(F.col("query_id") < q)
            .localCheckpoint(eager=True)
        )
        payload_mb = q * 14 * 4 * 256 * 8 / 1e6
        row = {"Q": q, "literal_payload_mb": round(payload_mb, 1)}
        for side in ("table", "literal"):
            try:
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    ivf_pq_search_coded(
                        coded, emb, queries, cents, books,
                        k=10, nprobe=14, refine=16, code_bits=8,
                        probe_side=side,
                    ).write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
                row[side] = round(best, 2)
            except Exception as ex:  # the wall IS the result
                traceback.print_exc()
                row[side] = f"FAILED: {type(ex).__name__}"
        print(row, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
