#!/usr/bin/env python
"""Measure the literal-vs-table ADC crossover (r14 verdict task 3):
ivf_pq_search_coded at the registered m=4 x k=256 x nprobe=14 knobs,
query count swept 5 -> 100 -> 1000 on the sf0.1 corpus, both probe
sides timed (min-of-3) on the same committed encode. SCALE.md
adc_probe_table_crossover records the result.

Usage: python tools/adc_crossover_probe.py
"""
import os
import sys
import time

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
    spark = get_session("adc-crossover", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    emb = load(spark, SF, "embeddings")
    cents = train_coarse_centroids_int(emb, k=16, iters=3, hash_tag="pq:0")
    books = train_pq_codebooks_int(emb, m=4, k=256)
    coded = pq_encode_int(
        emb, books, coarse_milli=cents, code_bits=8
    ).select("vec_id", "codes_packed", "__list").localCheckpoint(eager=True)
    coded.count()
    for q in (5, 100, 1000):
        queries = emb.filter(F.col("vec_id") < q).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        ).localCheckpoint(eager=True)
        payload_mb = q * 14 * 4 * 256 * 8 / 1e6
        row = {"Q": q, "literal_payload_mb": round(payload_mb, 2)}
        for side in ("literal", "table"):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                ivf_pq_search_coded(
                    coded, emb, queries, cents, books,
                    k=10, nprobe=14, refine=16, code_bits=8,
                    probe_side=side,
                ).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            row[side] = round(best, 3)
        print(row, flush=True)


if __name__ == "__main__":
    main()
