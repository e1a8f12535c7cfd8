"""Round-17 intent tests: the optimization round's behavior-preserving
claims, pinned. Each test targets one r17 change whose equivalence
argument is documented in OPTIMIZATION_r17.md."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window


def _rows(df):
    from collections import Counter

    return Counter(tuple(r) for r in df.collect())


def test_near_dup_fusion_equals_candidate_retokenize(spark, sf_dir):
    """The r17 shared-scan fusion (tokenize once into a doc-keyed store;
    verify joins the store) must return EXACTLY the pairs of the r16
    shape (re-scan the corpus, broadcast-filter on candidate ids,
    re-tokenize candidates, verify) — the fusion claim is 'same
    results, one fewer corpus pass', so the old path is recomputed
    here verbatim as the reference."""
    from recipes_spark.io import load, scale_partitions
    from recipes_spark.operators.dedup import band_hashes, jaccard_verify
    from recipes_spark.registry import all_queries

    fused = all_queries()["near_dup_wordset"](spark, sf_dir)

    docs = load(spark, sf_dir, "documents")
    word_set = F.array_sort(F.array_distinct(F.split("text", " ")))
    d = scale_partitions(docs).select(
        "doc_id", "lang", "source", word_set.alias("s")
    )
    bh = band_hashes(
        d, id_col="doc_id", set_col="s", carry_cols=("lang", "source")
    )
    cand = (
        bh.alias("a")
        .join(bh.alias("b"), ["bhash", "lang", "source"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .localCheckpoint(eager=True)
    )
    ids = (
        cand.select(F.col("id_a").alias("doc_id"))
        .unionByName(cand.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    d_cand = (
        scale_partitions(
            docs.select("doc_id", "text").join(F.broadcast(ids), "doc_id")
        )
        .select("doc_id", word_set.alias("s"))
        .localCheckpoint(eager=True)
    )
    reference = jaccard_verify(cand, d_cand, id_col="doc_id", set_col="s")
    assert _rows(fused) == _rows(reference)


def test_minhash_fusion_single_corpus_tokenize(spark, sf_dir):
    """The fused minhash_lsh_pairs must verify from the SAME store the
    banding read: the returned plan's leaves are checkpoint RDD scans
    only (no parquet re-scan of the corpus inside the verify), and the
    corpus-sized store stays on the STREAM side of both verify joins
    (BroadcastHashJoin with the candidate-proportional build)."""
    from recipes_spark.registry import all_queries

    df = all_queries()["x2_minhash_lsh"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan, (
        "verify re-scanned the corpus — fusion regressed:\n" + plan
    )
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_benford_total_from_digit_counts(spark, sf_dir):
    """agg_benford's total-row count now derives from the digit
    histogram (sum of per-digit counts) instead of a second full scan
    — identical by construction (every row lands in exactly one digit
    group); pinned by recomputing the old way."""
    from recipes_spark.io import load
    from recipes_spark.registry import all_queries

    out = {
        r["digit"]: r.asDict()
        for r in all_queries()["agg_benford"](spark, sf_dir).collect()
    }
    li = load(spark, sf_dir, "lineitem")
    total = li.count()
    n_obs = sum(r["n_obs"] for r in out.values())
    # digits 1-9 cover every positive price; the engine's histogram
    # total must equal the full-scan count the old code used.
    assert n_obs == total


def test_load_cache_invalidates_on_inplace_part_rewrite(spark, tmp_path):
    """The io.load plan cache keys parquet DIRECTORIES on their
    recursive part-file listing (count, total bytes, max mtime):
    rewriting a part file IN PLACE — which changes neither the
    directory's own mtime_ns nor its size, the r16 key — must serve
    fresh data, not the cached stale plan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from recipes_spark.io import load

    d = str(tmp_path / "sfdir")
    table_dir = f"{d}/tiny.parquet"
    import os

    os.makedirs(table_dir)
    part = f"{table_dir}/part-00000.parquet"
    pq.write_table(pa.table({"v": [1, 2, 3]}), part)

    first = sorted(r["v"] for r in load(spark, d, "tiny").collect())
    assert first == [1, 2, 3]

    dir_stat_before = os.stat(table_dir)
    pq.write_table(pa.table({"v": [7, 8, 9]}), part)
    # The latent-staleness precondition: the directory's OWN stat is
    # unchanged by the in-place rewrite (same entry set).
    dir_stat_after = os.stat(table_dir)
    assert dir_stat_before.st_size == dir_stat_after.st_size

    second = sorted(r["v"] for r in load(spark, d, "tiny").collect())
    assert second == [7, 8, 9]


def test_catalog_search_nonfinite_bbox(spark, sf_dir):
    """A bbox carrying inf/nan must not crash the SQL fast path (repr
    renders 'infD'/'nanD', which the parser rejects — r16 ADVICE); it
    routes through the Column path and behaves like F.lit: an all-
    covering (-inf..inf) box matches everything a finite box would."""
    from recipes_spark.plans.catalog import catalog_search
    from recipes_spark.queries.stac import _metadata, build_items

    items = build_items(_metadata(spark, sf_dir))
    finite = catalog_search(items, bbox=(-180.0, -90.0, 180.0, 90.0)).count()
    inf = catalog_search(
        items, bbox=(float("-inf"), float("-inf"), float("inf"), float("inf"))
    ).count()
    assert inf == finite


def test_extra_conf_value_rendering():
    """JSON booleans/null/numbers in SPARK_GRAFT_EXTRA_CONF render as
    Spark-parsable conf strings (true/false/null/128m), never Python
    repr ("True"/"None") — r16 ADVICE."""
    from recipes_spark.session import _conf_value

    assert _conf_value(True) == "true"
    assert _conf_value(False) == "false"
    assert _conf_value(None) == "null"
    assert _conf_value(128) == "128"
    assert _conf_value("256m") == "256m"
