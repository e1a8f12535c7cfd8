#!/usr/bin/env python
"""Round-16 probe: where does x2_minhash_lsh's ~1s go?

Phases timed separately (each min-of-N on a warm session):
  kernel   — _band_rows checkpoint alone (scan → shingle → sha256 →
             numpy banding kernel → localCheckpoint)
  cand     — banding rows self-join + dropDuplicates, counted
  full     — the registered query end-to-end (noop sink)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "5"))


def main() -> None:
    import pyspark.sql.functions as F

    from recipes_spark.io import load
    from recipes_spark.functions.text import word_shingles
    from recipes_spark.io import scale_partitions
    from recipes_spark.operators.dedup import _band_rows
    from recipes_spark.registry import all_queries
    from recipes_spark.session import get_session

    spark = get_session("x2-phase-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    spark.range(0, 1024, 1, 32).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).write.format("noop").mode("overwrite").save()

    def timed(label, fn):
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"phase": label, "best_sec": round(best, 3)}), flush=True)
        return best

    d = load(spark, SF_DIR, "documents")

    def shingled_df():
        return scale_partitions(
            d.select(F.col("doc_id").alias("__id"), F.col("text").alias("__t"))
        ).select("__id", word_shingles("__t", 3).alias("__sh"))

    def banded_df():
        return _band_rows(
            shingled_df(), id_col="__id", set_col="__sh",
            num_hashes=64, bands=16, portable=True,
        )

    timed("shingle_only", lambda: shingled_df().write.format("noop").mode("overwrite").save())
    timed("kernel_checkpoint", banded_df)

    banded = banded_df()

    def cand_df():
        return (
            banded.alias("a")
            .join(banded.alias("b"), "bhash")
            .filter(F.col("a.__id") < F.col("b.__id"))
            .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )

    timed("cand_from_warm_banded", lambda: cand_df().write.format("noop").mode("overwrite").save())
    n_cand = cand_df().count()
    print(json.dumps({"n_cand": n_cand}), flush=True)

    fn = all_queries()["x2_minhash_lsh"]
    timed("full_query", lambda: fn(spark, SF_DIR).write.format("noop").mode("overwrite").save())


if __name__ == "__main__":
    main()
