"""Query registry: the single source of truth behind __spark_entry__.py.

Every implemented operator from SURVEY.md §2 registers here as a named
query callable ``(spark, sf_dir) -> DataFrame`` plus (when the operator is
SQL-expressible) an equivalent DuckDB oracle SQL string. The driver runs
both sides at sf0.01 and compares row-count + schema + order-insensitive
value hash — so every computed column must carry the SAME alias in the
Spark plan and the oracle SQL.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

#: Queries whose implementation changed in round N: driver CORRECTNESS
#: rows from rounds BEFORE N no longer attest the current code, so the
#: query re-queues until a round >= N re-verifies it (then this entry is
#: inert — no manual cleanup needed). name -> first round whose rows
#: still count.
_RECHECK: dict[str, int] = {
    "x6_packing_plan": 2,    # resharded cumsum (was single-task global window)
    "s4_manifest": 2,        # arithmetic-key rewrite (ed7a8b3) post-dated r1 row
    # round-3 TIMESTAMP_NTZ normalization (io._canonical_timestamps)
    # changed the event-time type every one of these sees:
    "gap_detect": 3,
    "window_range_interval": 3,
    "st2_tumbling_stream": 3,
    "st3_sliding_stream": 3,
    "st4_session_stream": 3,
    "st5_watermark_late": 3,
    "st6_stream_dedup": 3,
    "st8_stream_join": 3,
    # round-3 banding rewrite (two-narrow-agg _band_rows; blocked
    # candidate join in near_dup_wordset) — x2_minhash_lsh moved to the
    # round-4 tier below:
    "near_dup_wordset": 3,
    "x2_dedup_groups": 3,
    "x2_dedup_groups_star": 3,
    # round-3 perf rewrites (bigint SimHash sketch; broadcast-probe
    # blocked fuzzy join; numpy LSH sketch + payload-free banding join
    # + parallel verify; materialized tf):
    # x2_simhash moved to the round-12 tier below (portable family).
    "x7_fuzzy_match": 3,
    "embedding_neardup": 3,
    "x3_semantic_dedup": 3,
    "tfidf_top_terms": 3,
    "agg_percentiles": 3,
    # round-4 oracle-type fixes (DuckDB HUGEINT aggregates cast to BIGINT;
    # Spark values were already correct, the oracle output dtype changed):
    "q11_important_parts": 4,
    "agg_argmax_conditional": 4,
    "x4_filter_sweep": 4,
    # round-4 banding hash-family change (splitmix64 numpy kernel replaced
    # the xxhash64 lane aggregates): every ORACLED consumer was verified
    # bit-identical at sf0.001/0.01/0.1 before landing, but these two are
    # candidate-set-sensitive without a full oracle (st12's banding
    # feeds an accumulated cross-batch index), so a marginal pair
    # COULD differ — re-attest under the new family:
    "st12_stream_neardup": 4,
    # x3_pq_codes moved to the round-12 tier below (integer milli-grid
    # train+encode, fully oracled).
    # round-5 oracle-convention fix: nll round(,4) double → floor-scaled
    # BIGINT nll_micro (summation-order flake risk flagged in r4 ADVICE):
    "x4_unigram_nll": 5,
    # round-7: st4 moved from append-mode rows-only to COMPLETE mode
    # with the full gaps-and-islands oracle — prior rows-only rows
    # attest the old append behavior, not the oracled one:
    "st4_session_stream": 7,
    # round-8: anchor batch bounded by a constant id ceiling (was a
    # fixed FRACTION of the corpus collected to the driver):
    "x3_triplet_mining": 8,
    # round-8: items gained xstac projection metadata (proj:epsg +
    # cube:dimensions + leading extension URIs) — the oracle widened:
    "stac_item_assembly": 8,
    # round-10: the last two full-vocabulary single-task rank windows
    # reshaped onto TakeOrderedAndProject (k-row heap) before ranking —
    # same oracle, same output, re-attest on the reshaped plans:
    "x4_zipf_fit": 10,
    "x4_vocab_coverage_curve": 10,
    # round-10: base_items melted to a single-pass long-form count +
    # pivot (was one scan per field) and dehydrate gained the sentinel
    # collision guard — same output, re-attest on the new plan:
    "stac_item_hydration": 10,
    # round-11: the verdict's "turn every documented 'at 100 TB do X
    # instead' caveat into the actual code" batch — same oracles,
    # reshaped plans, re-attest each:
    # confusion-matrix pre-agg replaced the broadcast-class crossJoin
    # over the scored corpus (×L row processing removed):
    "x4_lang_macro_f1": 11,
    # single-tokenize: the (doc, is_t, term, n) view is materialized
    # once and feeds BOTH the LM build and the scoring join (was two
    # corpus tokenize passes):
    "x4_dsir_weights": 11,
    # 60-bit hashed anchors through the duplicate-set shuffle (was raw
    # 8-gram text); the oracle replays the identical hash:
    "x2_substring_dedup": 11,
    # same hash-anchor convention for the benchmark-decontamination
    # join (corpus-side exploded grams + the broadcast set):
    "x4_decontaminate_spans": 11,
    # BPE family migrated to the SOUND double-marked symbol encoding
    # (\x1f s \x1e): the round-10 prefix-marked fold could merge INTO a
    # symbol whose name starts with the pattern's second element
    # ("more" folded to [m, ore], not BPE's [m, o, re]) — unreachable
    # on this corpus's 31-word vocab, but false in general; the
    # double-marked fold provably equals symbol-level rank-greedy BPE
    # for ANY valid table. Oracles re-rendered from the same literals:
    "x4_bpe_apply": 11,
    "x4_bpe_compression_curve": 11,
    "x4_bpe_fertility": 11,
    "x4_bpe_train_rounds": 11,
    "x6_packing_bpe": 11,
    # e2e composition: post-scrub floor + packing now run on REAL BPE
    # token counts (was whitespace), and the floor moved BEFORE the
    # survivor window (kills the kept='' hot key — ADVICE r10):
    "x6_corpus_pipeline_e2e": 11,
    # round-12: st28's serve phase derives the final state generation
    # from the state dir (max s_* bid, cross-checked against l_*)
    # instead of hardcoding s_3 — same oracle, same output, re-attest
    # on the generalized path (r11 verdict task 4 / ADVICE):
    "st28_stream_corpus_pipeline": 12,
    # round-12: benchmark-gram bloom pre-filter composed into the
    # decontamination plan (doc-level exists, zero shuffle) — the
    # bloom is a pure work-gate with no false negatives, so the
    # oracle is unchanged; re-attest on the gated plan:
    "x4_decontaminate_spans": 12,
    # round-12: the BPE training CTE chain is now AS MATERIALIZED
    # (DuckDB 1.0 inlines multiply-referenced CTEs → exponential
    # re-evaluation per round; required for the 12-round deep
    # composition). Output-identical, but the oracle TEXT changed —
    # re-attest the pair under the materialized chain:
    "x4_bpe_train_rounds": 12,
    "x4_bpe_train_apply": 12,
    # round-12: x2_minhash_lsh converted from rows-only to FULLY
    # ORACLED — portable sha-slice base hash + the banding kernel's
    # splitmix64/fold replayed in DuckDB HUGEINT arithmetic. Prior
    # rows-only (err=no_oracle) rows must not attest the oracled form:
    "x2_minhash_lsh": 12,
    # round-12: x2_simhash converted from rows-only to FULLY ORACLED —
    # sketch family moved from xxhash64 seeds to the portable 60-bit
    # sha-slice, whole pipeline (votes → sketch → bands → popcount)
    # replayed in DuckDB BIGINT arithmetic:
    "x2_simhash": 12,
    # round-12: the PQ pair converted from rows-only to FULLY ORACLED
    # on the integer milli grid — deterministic sample + hash-ranked
    # init + integer k-means (train_pq_codebooks_int), exact int64
    # codes/SSE/ADC shortlist, sequential-fold cosine re-rank; the
    # DuckDB oracle replays the whole train→encode(→search) pipeline:
    "x3_pq_codes": 12,
    "x3_pq_adc_topk": 12,
    # round-12: the remaining ANN legs converted the same way — IVF's
    # coarse quantizer is the m=1 integer trainer, LSH moved to
    # hash-signed ±1 planes on the milli grid, and the composition
    # fuses both; candidate sets are deterministic and oracle-replayed:
    "x3_ivf_topk": 12,
    "x3_lsh_topk": 12,
    "x3_ivf_pq_topk": 12,
    # round-12: MMR converted to portable integer scoring (shortlist's
    # round-4 relevance in bp + milli-grid floored redundancy) and
    # oracled via the unrolled greedy CTE chain; the conversion caught
    # a real greedy defect (negative redundancy clamped at 0):
    "x3_mmr_topk": 12,
    # round-12: DP trajectory simplification on the exact centi-degree
    # integer grid — split tests/argmax as integer rationals, the
    # recursion replayed as a recursive segment-splitting CTE:
    "g1_trajectory_simplify": 12,
    # round-13: MMR redundancy-denominator zero-norm guard (r12 ADVICE)
    # — greatest(n2, 1) added to BOTH engines' pred arithmetic; output
    # unchanged on this fixture (it has no zero-norm milli vectors) but
    # the oracle TEXT changed, so the pair re-attests together:
    "x3_mmr_topk": 13,
    # round-14: the PQ family moved from 4-bit nibble codes (k ≤ 16
    # per subspace) to the production 8-bit byte layout — m=4 × k=256
    # books, code_bits threaded through encode/ADC/composed plans, the
    # oracle's pack/train CTEs re-parameterized; outputs and oracle
    # texts both changed, so all three re-attest:
    "x3_pq_codes": 14,
    "x3_pq_adc_topk": 14,
    "x3_ivf_pq_topk": 14,
    # round-14: accuracy_micro's denominator clamped with
    # greatest(n_eval, 1) in BOTH engines (r13 ADVICE — an empty 20%
    # hash split must return 0, not null); output unchanged on every
    # fixture SF but the oracle TEXT changed:
    "x4_quality_classifier_eval": 14,
    # round-15: x3_pca_project re-expressed ON the exact fixed-point
    # top-2 siblings (r14 verdict task 4) — output moved from LAPACK
    # floats to the max-normalized exact integer projection and the
    # leg gained a full DuckDB oracle (rows-only 6 → 5); prior
    # rows-only rows attest the retired LAPACK form:
    "x3_pca_project": 15,
    # round-15: crosseval folded onto the shared classifier helpers
    # (_train_bucket_weights/_readable_expr_df/_confusion_metrics) —
    # same expressions, output, and oracle; re-attest on the
    # refactored body as a belt-and-braces measure:
    "x4_quality_classifier_crosseval": 15,
    # round-15: x3_knn_graph_ivf's registered knobs moved to the
    # MEASURED recall-economics point (r14 verdict task 6): nprobe
    # 4 → 8 of 16 cells (edge recall 0.60 → 0.84 at sf0.01, gate
    # raised 0.5 → 0.8), coarse book routed through a Spark broadcast
    # variable; the candidate set — the output — changed:
    "x3_knn_graph_ivf": 15,
    # round-16: the ADC probe TABLE now posexplodes per-query arrays on
    # executors instead of materializing Q·m·k_codes driver tuples
    # (r15 ADVICE) — same values, reshaped plan, re-attest:
    "x3_ivf_pq_table_topk": 16,
    # round-17: the k-core peel-chain oracle is now AS MATERIALIZED
    # per round (DuckDB inlines multiply-referenced CTEs → O(2^rounds)
    # re-evaluation, 175 s at sf0.01; the r12 x4_bpe_train_rounds
    # failure class). Output-identical, oracle TEXT changed —
    # re-attest the pair under the materialized chain:
    "x7_kcore": 17,
}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _driver_attested() -> set[str]:
    """Names already attested by a driver CORRECTNESS_r*.json row.

    A row attests a query when its value hash matched the DuckDB oracle, or
    when the query is intentionally oracle-free and the driver recorded the
    rows-only check. Error rows do NOT attest, and rows from rounds before
    a query's ``_RECHECK`` entry don't either (the implementation changed
    after they were taken)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict) or rnd < _RECHECK.get(name, 0):
                continue
            if row.get("hash_match") or row.get("err") == "no_oracle":
                names.add(name)
    return names


#: Unattested names the driver's bounded sample missed in a prior round
#: (registered too late in the ordering): serve these FIRST within the
#: unattested tier so the oldest attestation debt clears before anything
#: newer. Inert once attested.
_FRONT: list[str] = [
    "g7_points_in_polygons",
    "g8_stay_points",
    "x5_scene_cuts",
]

#: Names registered in RECENT rounds (name -> registration round):
#: serve these LAST within the unattested tier, ordered by round, so a
#: newer registration can never displace older attestation debt from
#: the driver's bounded per-round sample. Inert once attested.
_DEFER: dict[str, int] = {
    "stac_fields_paged_search": 8,
    "x4_top_ngram_fraction": 8,
    "x4_gopher_filter": 8,
    "stac_queryables": 8,
    "st24_stream_hll": 8,
    "scalar_bitwise": 8,
    "x6_kanon_release": 8,
    "x3_knn_graph": 8,
    "ts_changepoint": 8,
    "x7_modularity": 8,
    "ts_theil_sen": 8,
    "g9_trajectory_stats": 8,
    "agg_hodges_lehmann": 8,
    "x6_drop_provenance": 8,
    "window_twap": 8,
    "x5_mp4_boxes": 8,
    "agg_spearman": 8,
    "st25_stream_twap": 8,
    "agg_mann_kendall": 8,
    "x6_budget_apportion": 8,
    "agg_share_of_parent": 8,
    "x5_media_dedup_groups": 8,
    "agg_seasonal_strength": 8,
    "stac_search_intersects": 9,
    "stac_search_ids": 9,
    "stac_item_hydration": 9,
    "x4_line_dedup": 9,
    "x4_ndcg_eval": 9,
    "x4_url_canonicalize": 9,
    "window_ohlc": 9,
    "x3_matryoshka_eval": 9,
    "st26_stream_ohlc": 9,
    "scalar_inet": 9,
    "x4_reading_level": 9,
    "x6_skew_report": 9,
    "event_attribution_shapley": 9,
    "agg_fdr_bh": 9,
    "x2_substring_dedup": 10,
    "x4_bpe_apply": 10,
    "x6_corpus_pipeline_e2e": 10,
    "x6_packing_bpe": 10,
    "x4_bpe_train_rounds": 10,
    "x4_bpe_compression_curve": 10,
    "x4_decontaminate_spans": 10,
    "x4_dsir_weights": 10,
    "st27_stream_line_dedup": 10,
    "x4_bpe_fertility": 10,
    "x4_intradoc_line_dedup": 10,
    "x4_bpe_apply_greedy": 11,
    "x4_bpe_train_apply": 11,
    "x4_quality_classifier": 11,
    "x6_stratified_hash_sample": 11,
    "st28_stream_corpus_pipeline": 11,
    "x4_quality_classifier_trained": 12,
    "x4_bpe_train_apply_deep": 12,
    "x6_packing_ids": 12,
    "x6_packing_shards": 12,
    "x4_quality_classifier_train_apply": 13,
    "x6_release_materialize": 13,
    "x3_coarse_quantizer_train": 13,
    "g1_trajectory_simplify_chunked": 13,
    "x3_ivf_distrib_topk": 13,
    "x4_quality_classifier_eval": 13,
    "x3_power_iteration_project": 13,
    "x3_ivf_pq_distrib_topk": 14,
    "x3_power_iteration_top2": 14,
    "x6_release_increment": 14,
    "st29_stream_classifier": 14,
    "x4_quality_classifier_crosseval": 14,
    "x3_ivf_pq_residual_topk": 14,
    "st30_stream_packing": 14,
    "x4_classifier_calibration": 14,
    "x6_release_resume": 14,
    "x3_knn_graph_ivf": 14,
    "x3_index_commit": 15,
    "x3_index_search": 15,
    "x3_index_append": 15,
    "x3_ivf_pq_table_topk": 15,
    "x4_classifier_transfer": 15,
    "x4_threshold_from_keep_rate": 15,
    "st31_stream_index_append": 15,
    "x3_index_compact": 15,
    "x3_index_filtered_search": 15,
    "x3_index_radius_search": 15,
    "x3_index_cell_stats": 16,
    "x3_index_delete": 16,
    "x3_index_mmr_search": 16,
    "x4_hybrid_rrf": 16,
    "x3_index_retrain": 16,
    "x6_release_index_e2e": 16,
    "x3_index_delete_where": 16,
    "x3_index_delete_mor": 16,
    "x3_index_upsert": 16,
}


def all_queries() -> dict[str, QueryFn]:
    """All registered queries, driver-UNattested first.

    The correctness driver samples a bounded prefix of this dict per round,
    so ordering is staged: (1) changed queries (_RECHECK) still awaiting
    re-verification, (2) everything without a green CORRECTNESS row yet
    (including brand-new queries), (3) already-attested queries. Once a
    _RECHECK name is re-attested it leaves tier 1 and sorts like any other
    attested query. Within each tier, registration order (module import
    order in recipes_spark/queries/__init__.py) is kept, except that
    ``_FRONT`` names lead tier 2 and ``_DEFER`` names trail it.
    """
    _ensure_loaded()
    attested = _driver_attested()
    ordered: dict[str, QueryFn] = {}
    for name, fn in _QUERIES.items():
        if name in _RECHECK and name not in attested:
            ordered[name] = fn
    for name in _FRONT:
        if name in _QUERIES and name not in attested and name not in ordered:
            ordered[name] = _QUERIES[name]
    for name, fn in _QUERIES.items():
        if name not in attested and name not in ordered and name not in _DEFER:
            ordered[name] = fn
    deferred = [
        n for n in _QUERIES if n not in attested and n not in ordered
    ]
    for name in sorted(deferred, key=lambda n: _DEFER.get(n, 0)):
        ordered[name] = _QUERIES[name]
    for name, fn in _QUERIES.items():
        if name not in ordered:
            ordered[name] = fn
    return ordered


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    # Mirror all_queries() ordering so drivers iterating either dict agree.
    order = list(all_queries())
    return {n: _ORACLES[n] for n in order if n in _ORACLES}


_loaded = False


def _ensure_loaded() -> None:
    global _loaded
    if _loaded:
        return
    # Import every query module for registration side effects.
    from recipes_spark import queries  # noqa: F401

    _loaded = True
