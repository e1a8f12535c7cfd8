"""Every registered oracle query must match DuckDB at the DRIVER's
scale factor (sf0.01 by default — see conftest.ORACLE_SF_DIR) — the
local replica of the driver's CORRECTNESS gate (schema + rows +
values), run at the same SF so local green predicts driver green.
Rows-only queries are smoke-checked (runs, stable schema)."""

from __future__ import annotations

import pytest

from recipes_spark.registry import all_oracles, all_queries
from tests.oracle_harness import (
    assert_plan_hygiene,
    compare_frames,
    driver_canonicalize,
    oracle_output_types,
    run_oracle,
)

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_no_hugeint_output(oracle_sf_dir, name):
    """DuckDB widens integer sum/count_if/product to HUGEINT, which pandas
    converts to float64 — the driver then hash-mismatches Spark's int64
    even when every value is equal (the r3 q11/agg_argmax failure class).
    Audit every oracle's lazy output schema: any HUGEINT column must be
    CAST(... AS BIGINT) at the output. Catches the whole class without
    executing a single query."""
    bad = [
        (col, typ)
        for col, typ in oracle_output_types(ORACLES[name], oracle_sf_dir)
        if "HUGEINT" in typ.upper()
    ]
    assert not bad, (
        f"{name}: HUGEINT oracle output column(s) {bad} — wrap the "
        "aggregate in CAST(... AS BIGINT) (see relational.py docstring)"
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, oracle_sf_dir, name):
    sdf = QUERIES[name](spark, oracle_sf_dir)
    assert_plan_hygiene(sdf, name)
    odf = run_oracle(ORACLES[name], oracle_sf_dir)
    spdf = sdf.toPandas()
    # Driver-style canonicalization on the SAME collected result the
    # oracle compare uses — oracled queries get the output-shape check
    # here (at the driver's SF, no second execution); rows-only queries
    # get it in test_driver_canonicalizable.
    driver_canonicalize(spdf)
    problems = compare_frames(spdf, odf, name)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_driver_canonicalizable(spark, sf_dir, name):
    """EVERY registered query must produce an output the driver can
    canonicalize (pandas sort over all columns + cell value-hash):
    round 3's leak was dtypes, round 4's was an array<int> cell that
    crashed the driver's sorter on a rows-only query. Coverage is
    split to avoid running every oracled query twice —
    test_oracle_match canonicalizes the oracled queries' outputs on
    its already-collected result; this test runs the rows-only
    remainder at sf0.001 (subsuming the old rows-only smoke check:
    full execution + stable schema). Together: no output-shape
    violation can reach the driver."""
    df = QUERIES[name](spark, sf_dir)
    assert df.columns  # stable schema
    assert_plan_hygiene(df, name)
    driver_canonicalize(df.toPandas())


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_asof_join_partitioning_invariant(spark, sf_dir):
    """The as-of tiebreak must make the result independent of physical
    partitioning: the same query at 3 vs 32 shuffle partitions returns
    the identical row set (pre-fix, ties on (key, ts) were resolved by
    partition order)."""
    from recipes_spark.registry import all_queries

    q = all_queries()["join_asof"]

    def run():
        return {tuple(r) for r in q(spark, sf_dir).collect()}

    default = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        low = run()
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        high = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default)
    assert low == high


def test_approx_percentiles_track_exact(spark, oracle_sf_dir):
    """agg_percentiles_approx must stay within 0.5% relative error of
    the exact per-group percentiles — the gate that lets the sketch
    stand in for the exact aggregate at 100 TB."""
    from recipes_spark.registry import all_queries

    q = all_queries()
    exact = {
        r["l_returnflag"]: r.asDict()
        for r in q["agg_percentiles"](spark, oracle_sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: r.asDict()
        for r in q["agg_percentiles_approx"](spark, oracle_sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for flag, ex in exact.items():
        for col in ("p25", "p50", "p75", "p99"):
            rel = abs(approx[flag][col] - ex[col]) / abs(ex[col])
            assert rel <= 0.005, (flag, col, approx[flag][col], ex[col])


PARTITION_SENSITIVE = [
    # Window-rank / top-k / hash-bucketed / kernel-backed queries where a
    # partitioning-dependent tie-break or partial-aggregation order is
    # the classic silent-nondeterminism bug class. Each must return an
    # identical row set at 3 vs 32 shuffle partitions.
    "topk_per_group",
    "window_rank",
    "x6_epoch_shuffle",
    "x4_cms_heavy_hitters",
    "x4_bpe_merge_step",
    "vocab_top_bigrams",
    "x2_minhash_lsh",
    "x3_filtered_topk",
    "x6_temperature_sample",
    "x6_inference_batching",
    # Iterative integer-state ranking: per-iteration join+agg must not
    # leak partial-agg order (integers make it provably invariant —
    # this pins that the implementation keeps it so).
    "x7_pagerank",
    # Integer-exact LM scores (per-term floor BEFORE the weighted sum,
    # integer-division mean): provably order-insensitive — pinned here.
    "x4_unigram_nll",
    "x4_bigram_nll",
    # Deterministic-tiebreak claims (struct-max lexicographic argmax,
    # per-stratum quotas, per-cluster survivor selection): the entire
    # point of those tiebreaks is partition-independence — pin it.
    "agg_mode_median",
    "agg_argmax_conditional",
    "x6_stratified_topk",
    "x2_best_survivor",
    # Round-7 second wave: nearest-asof's per-instant tie
    # pre-aggregation, the weighted sample's (priority, id) window
    # tiebreak, label propagation's (count, -label) struct argmax, the
    # rolling-corr frame membership under timestamp ties, the
    # interval join's responsibility filter, and the interleave's
    # total (vkey, source, k) order — each is a determinism CLAIM, so
    # each is pinned against partitioning here.
    "join_asof_nearest",
    "x6_weighted_sample",
    "x7_label_propagation",
    "window_autocorr",
    "join_interval_overlap",
    "x6_interleave_schedule",
    # Round-8: rfm's quintile scores come from the sharded global
    # row-number (range shuffle + offset scan) — the rank, hence every
    # score, must not depend on where shard boundaries fall.
    "event_rfm_segments",
    # Round-8 second wave: knn-graph's top-3 ties break on candidate
    # id over block-join tiles; Theil-Sen's median pick is a rank over
    # (slope, bi, bj) — both are determinism claims over join/window
    # order, so both pin against partitioning.
    "x3_knn_graph",
    "ts_theil_sen",
    # Round-9 reshapes: both split a hot-key (event_type) computation
    # across range shards and stitch at the seams — the answer must
    # not depend on where the shard boundaries fall (3 vs 32 shards
    # moves every seam).
    "window_twap",
    "agg_spearman",
    # Round-9 determinism claims: OHLC's open/close are struct-argmax
    # tiebreaks whose partial aggregates must combine associatively;
    # line dedup reassembles docs from array_sort(collect_list(...)),
    # where collect_list order is partitioning-dependent BY DESIGN and
    # the sort must fully cancel it.
    "window_ohlc",
    "x4_line_dedup",
    # nDCG's two-phase top-10: local selection boundaries move with
    # the partitioning; the final rank must fully cancel them.
    "x4_ndcg_eval",
]


@pytest.mark.parametrize("name", PARTITION_SENSITIVE)
def test_partition_invariance(spark, sf_dir, name):
    """Results must be independent of physical partitioning: the same
    query at 3 vs 32 shuffle partitions returns the identical
    (order-insensitive) row set. Generalizes the as-of join invariant
    below to the query classes where partition-order leaks hide —
    window tie-breaks, partial top-k selection, Arrow-kernel batch
    boundaries, hash-threshold sampling. Multiset compare (Counter,
    not set) so a partitioning-dependent duplicate row — same values,
    different multiplicity — also fails."""
    from collections import Counter

    def rows(parts: str) -> Counter:
        default = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            return Counter(
                tuple(r) for r in QUERIES[name](spark, sf_dir).collect()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", default)

    assert rows("3") == rows("32")
