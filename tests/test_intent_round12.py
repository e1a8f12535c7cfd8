"""Round-12 intent tests: the trained 50k-bucket quality classifier
(kernel ≡ literal-form gate on a shared-seed config, both-directions
threshold, planted ordering), the bloom pre-filter composed into
decontamination, and the portable-hash MinHash-LSH oracle."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from recipes_spark.registry import all_queries
from tests.test_intent_round7 import _mini_docs

QUERIES = all_queries()


def test_quality_kernel_bit_identical_to_literal_form(spark, sf_dir):
    """The shared-seed gate (r11 verdict task 1): the Arrow kernel at
    dim 64 with the literal form's exact seed lists / base / threshold
    must reproduce x4_quality_classifier BIT-identically — same
    per-doc token counts, scores, and keep decisions. Any drift in the
    bucket hash, the collision accumulation, or the floor arithmetic
    between the closure path and the expression-tree path fails
    here."""
    from recipes_spark.io import load, scale_partitions
    from recipes_spark.queries.corpus_ops import (
        _QF_BAD,
        _QF_DIM,
        _QF_GOOD,
        _QF_THRESHOLD_MICRO,
        _qft_weight_rows,
        quality_score_kernel,
    )

    literal = {
        r["doc_id"]: (r["n_tok"], r["score_micro"], r["keep"])
        for r in QUERIES["x4_quality_classifier"](spark, sf_dir).collect()
    }
    gen = quality_score_kernel(
        _qft_weight_rows(_QF_DIM, _QF_GOOD, _QF_BAD, _QF_THRESHOLD_MICRO),
        _QF_DIM,
        _QF_THRESHOLD_MICRO,
        _QF_THRESHOLD_MICRO,
    )
    d = scale_partitions(load(spark, sf_dir, "documents"))
    kernel = {
        r["doc_id"]: (r["n_tok"], r["score_micro"], r["keep"])
        for r in d.select("doc_id", "text")
        .mapInPandas(
            gen,
            schema="doc_id bigint, n_tok bigint, score_micro bigint, keep int",
        )
        .collect()
    }
    assert kernel == literal and len(kernel) > 0


def test_quality_trained_threshold_fires_both_directions(spark, sf_dir):
    """The trained form's keep boundary must demonstrably fire both
    ways on the sf corpus (the literal form's contract, kept)."""
    keeps = {
        r["keep"]
        for r in QUERIES["x4_quality_classifier_trained"](
            spark, sf_dir
        ).collect()
    }
    assert keeps == {0, 1}


def test_quality_trained_planted_ordering(spark, tmp_path):
    """Planted triple through the TRAINED vector: a stopword-rich doc
    scores above a neutral doc scores above a spam doc, and the keep
    decisions split exactly at the good/neutral boundary (threshold =
    base + 1: only strictly-positive good-mass keeps)."""
    rows = [
        (0, "the a and of to in is it on for"),
        # Tokens verified base-bucketed (no collision with any seed
        # bucket at _QFT_DIM) — 'qqq' e.g. lands on a boosted bucket.
        (1, "www eee rrr ttt yyy uuu iii ooo"),
        (2, "click buy free winner casino subscribe"),
    ]
    sf = _mini_docs(spark, tmp_path, rows)
    out = {
        r["doc_id"]: (r["score_micro"], r["keep"])
        for r in QUERIES["x4_quality_classifier_trained"](spark, sf).collect()
    }
    assert out[0][0] > out[1][0] > out[2][0]
    assert out[0][1] == 1 and out[1][1] == 0 and out[2][1] == 0


def test_decontaminate_bloom_gate_no_false_negative(spark, tmp_path):
    """The bloom pre-filter is a pure work-gate: a corpus doc sharing
    an 8-gram with the benchmark slice MUST still be scrubbed (the
    bloom cannot produce a false negative), and clean docs still pass
    through verbatim with empty removal counts."""
    bench_gram = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, f"benchmark prefix {bench_gram} benchmark suffix"),
        (20, f"pre {bench_gram} post filler filler2 filler3"),
        (21, "clean doc with entirely unshared tokens one two three"),
    ]
    sf = _mini_docs(spark, tmp_path, rows)
    out = {
        r["doc_id"]: (r["n_removed"], r["text_clean"])
        for r in QUERIES["x4_decontaminate_spans"](spark, sf).collect()
    }
    assert set(out) == {20, 21}  # bench slice (doc_id < 20) not emitted
    assert out[20][0] > 0 and bench_gram not in out[20][1]
    assert out[21][0] == 0 and out[21][1] == rows[2][1]


def test_sm64_py_matches_numpy_kernel():
    """The oracle's pure-Python SplitMix64 (used to precompute the
    VALUES-inlined lane/band keys) must be bit-identical to the numpy
    finalizer inside the banding kernel — a divergence would silently
    desynchronize every oracle-replayed band hash."""
    import numpy as np

    from recipes_spark.operators.dedup import _splitmix64
    from recipes_spark.queries.dataops import _sm64_py

    rng = np.random.default_rng(42)
    vals = rng.integers(0, 1 << 64, size=4096, dtype=np.uint64)
    expect = _splitmix64(vals)
    got = np.array([_sm64_py(int(v)) for v in vals], dtype=np.uint64)
    assert (got == expect).all()
    # Boundary values, where wraparound bugs live.
    for v in (0, 1, (1 << 64) - 1, 1 << 63, 0xBF58476D1CE4E5B9):
        assert _sm64_py(v) == int(_splitmix64(np.array([v], dtype=np.uint64))[0])


def test_minhash_lane_keys_match_kernel_constants():
    """The (lane_key, band_key) constants the oracle inlines must equal
    the ones _band_rows derives with numpy — same seed recurrence,
    same xor constant, same order."""
    import numpy as np

    from recipes_spark.operators.dedup import _splitmix64
    from recipes_spark.queries.dataops import _minhash_lane_keys

    n = 64
    lane_keys = _splitmix64(
        np.arange(1, n + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    )
    band_keys = _splitmix64(lane_keys ^ np.uint64(0xA5A5A5A55A5A5A5A))
    got = _minhash_lane_keys(n)
    assert [g[0] for g in got] == [int(x) for x in lane_keys]
    assert [g[1] for g in got] == [int(x) for x in band_keys]


def test_minhash_lsh_portable_finds_planted_neardups(spark, tmp_path):
    """The portable-hash family preserves the operator's behavior: a
    planted ~0.9-Jaccard pair is found (128/32-grade recall holds at
    64/16 for j=0.9: miss ≈ (1-0.9^4)^16 ≈ 3e-3), an unrelated doc
    pairs with nothing, and the emitted jaccard is the exact shingle
    value."""
    base = ("one two three four five six seven eight nine ten "
            "eleven twelve thirteen fourteen fifteen sixteen")
    rows = [
        (0, base),
        (1, base + " seventeen"),  # near-dup of 0
        (2, "completely different words nothing shared here at all "
            "zip zero nada none"),
    ]
    sf = _mini_docs(spark, tmp_path, rows)
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in QUERIES["x2_minhash_lsh"](spark, sf).collect()
    }
    assert set(pairs) == {(0, 1)}
    # 14 shared 3-shingles of 14 (doc0) vs 15 (doc1): J = 14/15.
    assert pairs[(0, 1)] == pytest.approx(round(14 / 15, 4))


def test_greedy_ids_kernel_equals_fold_id_stream(spark, sf_dir):
    """The id-LEVEL form of the fold ≡ rank-greedy theorem: the ids
    array bpe_greedy_ids_kernel emits must equal the Catalyst
    double-marked fold's id sequence per document (same vocab lookup,
    same order) — x4_bpe_apply only pins the checksum; packing ships
    the stream itself, so pin the stream."""
    import pyspark.sql.functions as F

    from recipes_spark.io import load, scale_partitions
    from recipes_spark.queries.corpus_ops import (
        _BPE_MERGES,
        _BPE_VOCAB,
        _bpe_folded,
        bpe_greedy_ids_kernel,
    )

    d = scale_partitions(load(spark, sf_dir, "documents"))
    gen = bpe_greedy_ids_kernel(_BPE_MERGES, _BPE_VOCAB)
    kernel = {
        r["doc_id"]: list(r["ids"])
        for r in d.select("doc_id", "text")
        .mapInPandas(gen, "doc_id bigint, n bigint, ids array<int>")
        .collect()
    }
    vocab = F.array(*[F.lit(v) for v in _BPE_VOCAB])
    folded = d.select(
        "doc_id",
        F.transform(
            F.filter(
                F.split(_bpe_folded(), "[\x1f\x1e ]"),
                lambda x: x != F.lit(""),
            ),
            lambda x: F.array_position(vocab, x).cast("int"),
        ).alias("ids"),
    )
    fold = {r["doc_id"]: list(r["ids"]) for r in folded.collect()}
    assert kernel == fold


def test_grid_dp_mask_equals_float_mask_on_grid_data():
    """douglas_peucker_mask_grid (g1's round-12 integer-exact form)
    must produce the SAME keep-mask as the float mask on centi-degree
    grid coordinates across many synthetic trajectories — the
    semantics didn't change, only the arithmetic became
    oracle-replayable. Uses the g1 derivation (event_id -> grid) over
    enough ids to exercise every distance case (degenerate, clamped
    both ends, perpendicular)."""
    import numpy as np

    from recipes_spark.operators.geometry import (
        douglas_peucker_mask,
        douglas_peucker_mask_grid,
    )

    rng = np.random.default_rng(7)
    for t in range(200):
        n = int(rng.integers(3, 60))
        ids = rng.integers(0, 1 << 31, size=n).astype(np.int64)
        xi = (ids * 7919) % 36000
        yi = (ids * 104729) % 17000
        if (xi == xi[0]).all() and (yi == yi[0]).all():
            continue
        grid = douglas_peucker_mask_grid(xi, yi, 50 * 50)
        flt = douglas_peucker_mask(
            xi / 100.0 - 180.0, yi / 100.0 - 85.0, 0.5
        )
        assert (grid == flt).all(), f"trajectory {t}: masks differ"
