"""Round-11 intent tests: the sound double-marked BPE fold vs the
Arrow rank-greedy encoder (equivalence gate + the collision word the
round-10 encoding folded wrong), hashed substring-dedup anchors, and
the e2e composition's BPE-count floor/packing."""

from __future__ import annotations

import pytest

from recipes_spark.registry import all_queries
from tests.test_intent_round7 import _mini_docs

QUERIES = all_queries()


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
)
def test_bpe_greedy_bit_identical_to_fold(spark, sf):
    """The verdict's gate: the Arrow rank-greedy encoder and the
    literal sound fold must be BIT-identical on the 12-merge table at
    every test scale factor — same doc set, same token counts, same
    OOV counts, same order-free id checksums."""
    fold = {
        r["doc_id"]: (r["n_tokens"], r["n_merges"], r["n_oov"],
                      r["ids_checksum"])
        for r in QUERIES["x4_bpe_apply"](spark, sf).collect()
    }
    greedy = {
        r["doc_id"]: (r["n_tokens"], r["n_merges"], r["n_oov"],
                      r["ids_checksum"])
        for r in QUERIES["x4_bpe_apply_greedy"](spark, sf).collect()
    }
    assert fold == greedy and len(fold) > 0


def test_bpe_sound_encoding_on_collision_words(spark, tmp_path):
    """The round-10 prefix-marked fold merged INTO a symbol whose name
    starts with the pattern's second element: 'more' folded to
    [m, ore] (3 chars of 'ore' fused, id OOV) instead of BPE's
    [m, o, re]. The double-marked fold must agree with rank-greedy on
    exactly these words:
    - 'more': m|o|re — 3 tokens, 1 merge, 0 OOV;
    - 'ore' : o|re  — 2 tokens, 1 merge, 0 OOV;
    - 'rer' : re|r  — 2 tokens, 1 merge, 0 OOV (the (r,e) merge binds
      leftmost; prefix-marking instead fused all of 'rer')."""
    rows = [(0, "more"), (1, "ore"), (2, "rer")]
    sf = _mini_docs(spark, tmp_path, rows)
    for name in ("x4_bpe_apply", "x4_bpe_apply_greedy"):
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_merges"], r["n_oov"])
            for r in QUERIES[name](spark, sf).collect()
        }
        assert got == {
            0: (3, 1, 0),
            1: (2, 1, 0),
            2: (2, 1, 0),
        }, name


def test_bpe_greedy_rejects_marker_in_input(spark, tmp_path):
    """The Arrow island mirrors _bpe_marked's fail-closed guard — on
    EITHER marker byte."""
    for bad in ("bad\x1fhere", "bad\x1ehere"):
        sf = _mini_docs(spark, tmp_path, [(0, "ok text"), (1, bad)])
        with pytest.raises(Exception, match="symbol marker|PythonException"):
            QUERIES["x4_bpe_apply_greedy"](spark, sf).collect()


def test_bpe_greedy_is_zero_shuffle(spark, sf_dir):
    """Same 100 TB claim as the fold: one mapInPandas island over the
    scan — no semantic exchange, no join."""
    df = QUERIES["x4_bpe_apply_greedy"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "Join" not in plan, plan
    assert "MapInPandas" in plan, plan


def test_bpe_train_apply_composition(spark, tmp_path):
    """The train→apply seam on the planted train-rounds corpus
    ('the'×3 + 'than' → merges (t,h), (th,e), (a,n)): the trained
    table must re-encode 'the the the' as THREE `the` tokens (9 base
    chars − 3 tokens = 6 merges applied) and 'than' as th|an (2
    tokens, 2 merges) — a rank-order or segmentation mismatch between
    trainer and encoder changes these counts."""
    rows = [(0, "the the the"), (1, "than")]
    sf = _mini_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_merges"])
        for r in QUERIES["x4_bpe_train_apply"](spark, sf).collect()
    }
    assert got == {0: (3, 6), 1: (2, 2)}


def test_bpe_train_apply_degenerate_corpus(spark, tmp_path):
    """A corpus of single-char words trains ZERO merges — both the
    Spark side (shorter table) and the oracle (empty-winner scalar
    subquery → no-op replace) must return every doc un-merged."""
    import duckdb

    from tests.oracle_harness import compare
    from recipes_spark.queries.corpus_ops import (
        _bpe_train_apply_oracle_sql,
    )

    rows = [(0, "a b c"), (1, "d e")]
    sf = _mini_docs(spark, tmp_path, rows)
    sdf = QUERIES["x4_bpe_train_apply"](spark, sf)
    got = {r["doc_id"]: (r["n_tokens"], r["n_merges"]) for r in sdf.collect()}
    assert got == {0: (3, 0), 1: (2, 0)}
    con = duckdb.connect()
    # _mini_docs writes a Spark parquet DIRECTORY — glob its parts.
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet/*.parquet'"
    )
    odf = con.sql(_bpe_train_apply_oracle_sql(3)).df()
    assert not compare(sdf, odf, "degenerate")


def test_quality_classifier_separates_planted_pair(spark, tmp_path):
    """The classifier's defining behavior: a stopword-built doc (every
    token in the GOOD seed list) scores the good-bucket mean and
    passes the keep threshold; a spam doc (every token in the BAD
    list) scores deeply negative and is dropped; a mixed doc lands
    between the two."""
    from recipes_spark.queries.corpus_ops import (
        _QF_BAD,
        _QF_GOOD,
        _QF_THRESHOLD_MICRO,
    )

    rows = [
        (0, " ".join(_QF_GOOD)),
        (1, " ".join(_QF_BAD)),
        (2, " ".join(_QF_GOOD[:5] + _QF_BAD[:5])),
    ]
    sf = _mini_docs(spark, tmp_path, rows)
    out = {
        r["doc_id"]: r
        for r in QUERIES["x4_quality_classifier"](spark, sf).collect()
    }
    assert out[0]["keep"] == 1 and out[1]["keep"] == 0
    assert (
        out[1]["score_micro"]
        < out[2]["score_micro"]
        < out[0]["score_micro"]
    )
    assert out[0]["score_micro"] >= _QF_THRESHOLD_MICRO


def test_stratified_hash_sample_is_deterministic_and_stratified(spark):
    """Two runs must produce IDENTICAL per-stratum counts (the whole
    point vs sampleBy's RNG), fractions must alternate 0.5/0.2 in
    sorted-lang order, and each stratum's realized rate must sit near
    its fraction."""
    sf = "/root/testdata/sf0.01"
    a = sorted(
        tuple(r)
        for r in QUERIES["x6_stratified_hash_sample"](spark, sf).collect()
    )
    b = sorted(
        tuple(r)
        for r in QUERIES["x6_stratified_hash_sample"](spark, sf).collect()
    )
    assert a == b and len(a) >= 2
    for i, (lang, frac, n_docs, n_sampled) in enumerate(a):
        assert frac == (500_000 if i % 2 == 0 else 200_000)
        assert abs(n_sampled / n_docs - frac / 1e6) < 0.15


def test_base_items_preserves_source_field_types(spark):
    """ADVICE r10: the single-pass melt canonicalizes values to
    string; each base_<f> must come back in the SOURCE field's type
    (here int), with the documented lexicographic count-tie contract
    on the string form."""
    from recipes_spark.plans.hydrate import base_items

    rows = [("a", "c1", 9), ("b", "c1", 9), ("c", "c1", 10)]
    df = spark.createDataFrame(
        rows, "id string, collection_id string, n int"
    )
    out = base_items(df, ["n"])
    assert dict(out.dtypes)["base_n"] == "int"
    assert out.collect()[0]["base_n"] == 9  # modal, not a tie


def test_bpe_greedy_large_table_matches_python_reference(spark, tmp_path):
    """A 1000-merge VALID synthetic table (gen-1 = the 676 letter
    pairs, gen-2 = pairs of adjacent gen-1 symbols, truncated to
    exactly 1000) through the same kernel must match an independent
    pure-Python double-marked FOLD — the fold ≡ rank-greedy theorem
    exercised far beyond the 12-merge table, on words engineered to
    chain merges across generations (ADVICE r11: the 8-letter alphabet
    only yielded 127 merges; 26 letters make the [:1000] cut real)."""
    import itertools
    import random

    letters = "abcdefghijklmnopqrstuvwxyz"
    gen1 = [(a, b) for a, b in itertools.product(letters, repeat=2)]
    gen2 = [
        (a + b, c + d)
        for (a, b), (c, d) in zip(gen1, gen1[1:])
    ]
    merges = (gen1 + gen2)[:1000]
    vocab = [a + b for a, b in merges] + list(letters)

    rng = random.Random(7)
    words = [
        "".join(rng.choice(letters) for _ in range(rng.randint(1, 12)))
        for _ in range(200)
    ]
    rows = [(i, " ".join(rng.sample(words, 8))) for i in range(40)]
    sf = _mini_docs(spark, tmp_path, rows)

    def fold_ref(text):
        sep, end = "\x1f", "\x1e"
        out_tok = out_ids0 = 0
        vpos = {v: i + 1 for i, v in enumerate(vocab)}
        m = "".join(
            c if c == " " else sep + c + end for c in text
        )
        for a, b in merges:
            m = m.replace(sep + a + end + sep + b + end, sep + a + b + end)
        syms = [s for s in m.replace(end, "\x00").replace(sep, "\x00")
                .replace(" ", "\x00").split("\x00") if s]
        ids = [vpos.get(s, 0) for s in syms]
        return (
            len(syms),
            sum(len(w) for w in text.split(" ")) - len(syms),
            sum(1 for i in ids if i == 0),
            sum(ids),
        )

    from recipes_spark.io import load
    from recipes_spark.queries.corpus_ops import bpe_greedy_kernel

    gen = bpe_greedy_kernel(merges, vocab)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_merges"], r["n_oov"],
                      r["ids_checksum"])
        for r in load(spark, sf, "documents")
        .select("doc_id", "text")
        .mapInPandas(
            gen,
            schema=(
                "doc_id bigint, n_tokens bigint, n_merges bigint,"
                " n_oov bigint, ids_checksum bigint"
            ),
        )
        .collect()
    }
    expected = {i: fold_ref(t) for i, t in rows}
    assert got == expected
    # The table must actually fire beyond the first generation.
    assert any(v[1] > 0 for v in expected.values())
