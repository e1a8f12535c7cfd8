"""Round-10 intent tests: the single-pass base_items melt, the
DO_NOT_MERGE collision guard, and the CQL2-JSON MultiPolygon parity
live where a plan-shape diff alone can't prove behavior."""

from __future__ import annotations

import pytest

from recipes_spark.registry import all_queries
from tests.test_intent_round7 import _mini_docs

QUERIES = all_queries()


def _tok(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_substring_dedup_maximal_spans_and_threshold(spark, tmp_path):
    """x2_substring_dedup's defining behavior on planted docs: a
    15-token shared span reports as ONE maximal island at the right
    (start, len) in BOTH docs with matching span hashes; a 10-token
    shared span (>= the 8-gram anchor, < the 12 threshold) is
    suppressed; a doc repeating its own 8-gram (nowhere else) reports
    nothing (cross-doc rule)."""
    big = _tok("s", 15)        # 15 shared tokens
    small = _tok("u", 10)      # 10 shared tokens — island forms, filtered
    selfrep = _tok("r", 8)     # 8 tokens repeated within ONE doc only
    rows = [
        (0, f"a0 a1 {big} b0 b1 b2"),              # big at start 3
        (1, f"c0 {big} {small} d0"),               # big at 2, small at 17
        (2, f"e0 e1 e2 {small} f0"),               # small at 4
        (3, f"{selfrep} g0 {selfrep}"),            # within-doc repeat
        (4, "plain filler words nothing shared here at all ok"),
    ]
    sf = _mini_docs(spark, tmp_path, rows)
    got = {
        (r["doc_id"], r["span_start"], r["span_len"]): r["span_sha"]
        for r in QUERIES["x2_substring_dedup"](spark, sf).collect()
    }
    assert set(got) == {(0, 3, 15), (1, 2, 15)}
    # Same maximal span → same extracted text → same sha.
    assert got[(0, 3, 15)] == got[(1, 2, 15)]


def test_substring_dedup_chains_overlaps_not_gaps(spark, tmp_path):
    """The documented chaining semantics: two regions duplicated
    against DIFFERENT partners that overlap by >= 7 tokens keep their
    anchor starts consecutive and report as ONE island; regions that
    merely abut or gap do not merge (and die to the threshold here).
    The 10-token partners themselves stay below the 12 threshold."""
    r = [f"r{i}" for i in range(10)]
    w = ["w0", "w1", "w2"]
    reg1 = " ".join(r)                 # r0..r9
    reg2 = " ".join(r[3:] + w)         # r3..r9 w0 w1 w2 (7-token overlap)
    p = _tok("p", 9)
    q = _tok("q", 9)
    rows = [
        (0, f"a0 a1 {reg1} {' '.join(w)} a2"),  # reg1 at 3, reg2 at 6
        (1, f"b0 {reg1} b1"),                   # partner for reg1 (10 < 12)
        (2, f"c0 {reg2} c1"),                   # partner for reg2 (10 < 12)
        (3, f"d0 {p} gap0 {q} d1"),             # gapped 9-islands, both < 12
        (4, f"e0 e1 {p} e2"),                   # partner for p
        (5, f"f0 {q} f1 f2"),                   # partner for q
    ]
    sf = _mini_docs(spark, tmp_path, rows)
    got = {
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in QUERIES["x2_substring_dedup"](spark, sf).collect()
    }
    assert got == {(0, 3, 13)}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_substring_dedup_matches_python_reference(spark, tmp_path, seed):
    """Property-grade check on seeded random corpora with heavy n-gram
    collisions (8-word alphabet): the Spark islands must EXACTLY equal
    an independent pure-Python reimplementation of the spec —
    cross-doc duplicated 8-gram starts, consecutive-run islands,
    span >= 12 threshold, sha over the extracted tokens."""
    import hashlib
    import random

    rng = random.Random(seed)
    alphabet = [f"w{i}" for i in range(8)]
    docs = {
        i: [rng.choice(alphabet) for _ in range(rng.randint(20, 40))]
        for i in range(12)
    }
    sf = _mini_docs(
        spark, tmp_path, [(i, " ".join(t)) for i, t in docs.items()]
    )

    grams = {}  # gram -> set of doc_ids
    for i, toks in docs.items():
        for s in range(len(toks) - 7):
            grams.setdefault(tuple(toks[s : s + 8]), set()).add(i)
    expected = set()
    for i, toks in docs.items():
        starts = sorted(
            s + 1
            for s in range(len(toks) - 7)
            if len(grams[tuple(toks[s : s + 8])]) >= 2
        )
        run = []
        for s in starts + [None]:
            if run and (s is None or s != run[-1] + 1):
                length = run[-1] - run[0] + 8
                if length >= 12:
                    text = " ".join(toks[run[0] - 1 : run[0] - 1 + length])
                    expected.add(
                        (i, run[0], length,
                         hashlib.sha256(text.encode()).hexdigest())
                    )
                run = []
            if s is not None:
                run.append(s)
    got = {
        (r["doc_id"], r["span_start"], r["span_len"], r["span_sha"])
        for r in QUERIES["x2_substring_dedup"](spark, sf).collect()
    }
    assert got == expected


def test_intradoc_line_dedup_keeps_first_ignores_crossdoc(spark, tmp_path):
    """x4_intradoc_line_dedup's defining contrast with the corpus-global
    C4 pass: a line repeated WITHIN one doc keeps only its first
    occurrence, while a line shared across three docs (once each —
    which x4_line_dedup would drop everywhere) is untouched here."""
    rep = "la la la"                       # one 3-token line
    shared = "shared footer line"
    rows = [
        (0, f"{rep} verse one x {rep} verse two y {rep}"),
        (1, f"{shared} body alpha a"),
        (2, f"{shared} body beta bb"),
        (3, f"{shared} body gamma c"),
    ]
    sf = _mini_docs(spark, tmp_path, rows)
    out = {
        r["doc_id"]: r
        for r in QUERIES["x4_intradoc_line_dedup"](spark, sf).collect()
    }
    assert out[0]["n_dropped"] == 2
    assert out[0]["kept_text"] == f"{rep} verse one x verse two y"
    for i in (1, 2, 3):
        assert out[i]["n_dropped"] == 0
        assert out[i]["kept_text"] == rows[i][1]


def test_dsir_weights_rank_target_like_docs_first(spark, tmp_path):
    """x4_dsir_weights' defining behavior: a raw doc written in the
    target slice's vocabulary scores a POSITIVE log-ratio weight and
    ranks above an off-topic doc whose terms the target never uses
    (negative weight); target docs themselves never appear in the
    output."""
    rows = [
        (0, "alpha beta gamma alpha beta gamma alpha beta"),  # target
        (1, "alpha gamma beta alpha gamma beta gamma alpha"),  # target
        (20, "alpha beta alpha beta gamma alpha"),            # on-topic
        (21, "zebra yak zebra yak zebra yak"),                # off-topic
    ]
    sf = _mini_docs(spark, tmp_path, rows)
    out = QUERIES["x4_dsir_weights"](spark, sf).collect()
    assert [r["doc_id"] for r in out] == [20, 21]
    assert out[0]["weight_micro"] > 0 > out[1]["weight_micro"]


def test_decontaminate_spans_benchmark_only(spark, tmp_path):
    """x4_decontaminate_spans' defining behavior vs span_scrub: ONLY
    benchmark-shared 8-grams are scrubbed — a span duplicated between
    two CORPUS docs (but absent from the benchmark) survives, a
    benchmark doc never appears in the output, and a clean corpus doc
    passes through verbatim."""
    leak = _tok("s", 8)    # in the benchmark AND one corpus doc
    cdup = _tok("u", 8)    # duplicated corpus-corpus only
    rows = [
        (1, f"bench header {leak}"),               # benchmark (id < 20)
        (20, f"a0 {leak} a1"),                     # contaminated
        (21, f"b0 {cdup} b1"),                     # corpus-corpus dup
        (22, f"c0 c1 {cdup}"),                     # corpus-corpus dup
        (23, "perfectly clean document body here with no leak at all"),
    ]
    sf = _mini_docs(spark, tmp_path, rows)
    out = {
        r["doc_id"]: r
        for r in QUERIES["x4_decontaminate_spans"](spark, sf).collect()
    }
    assert set(out) == {20, 21, 22, 23}
    assert out[20]["text_clean"] == "a0 a1"
    assert out[20]["n_removed"] == 8
    for i in (21, 22, 23):
        assert out[i]["text_clean"] == rows[[r[0] for r in rows].index(i)][1]
        assert out[i]["n_removed"] == 0


def test_bpe_rejects_marker_in_input(spark, tmp_path):
    """A document containing the U+001F symbol marker would spoof
    symbol boundaries and silently corrupt every downstream count/id —
    the encode must fail closed instead (the hydrate DO_NOT_MERGE
    discipline)."""
    sf = _mini_docs(spark, tmp_path, [(0, "ok text"), (1, "bad\x1fhere")])
    with pytest.raises(Exception, match="U\\+001F|SparkRuntimeException"):
        QUERIES["x4_bpe_apply"](spark, sf).collect()


def test_bpe_apply_merge_semantics(spark, tmp_path):
    """x4_bpe_apply's defining behavior on planted words (vocab ids:
    merge outputs 1..12 in table order, then a..z = 13..38):
    - 'the'  : t+h → th, th+e → the — ONE token, id 2, 2 merges;
    - 'there': the|re (the th-e merge consumes the e before e+r can
               fire; r+e still does) — ids 2+8, 3 merges;
    - 'tth'  : leftmost-non-overlapping — the (t,h) merge binds the
               SECOND t, leaving t|th — ids 32+1;
    - 'ab!'  : '!' is outside the vocab → OOV id 0, counted."""
    rows = [
        (0, "the"),
        (1, "there"),
        (2, "tth"),
        (3, "ab!"),
    ]
    sf = _mini_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_merges"], r["n_oov"], r["ids_checksum"]
        )
        for r in QUERIES["x4_bpe_apply"](spark, sf).collect()
    }
    assert got == {
        0: (1, 2, 0, 2),
        1: (2, 3, 0, 10),
        2: (2, 1, 0, 33),
        3: (3, 0, 1, 13 + 14),
    }


def test_bpe_train_rounds_planted_merge_sequence(spark, tmp_path):
    """x4_bpe_train_rounds' defining behavior: merges are
    DATA-DEPENDENT and sequential — round 2 counts pairs over round 1's
    MERGED vocabulary. Planted: 'the'x3 + 'than'x1 → round 1 merges
    (t,h) freq 4; round 2 sees th as ONE symbol and merges (th,e)
    freq 3 (a char-level counter would pick (h,e)); round 3's tie at
    freq 1 breaks by pattern order → (a,n)."""
    rows = [(0, "the the the"), (1, "than")]
    sf = _mini_docs(spark, tmp_path, rows)
    got = [
        (r["round"], r["pair"], r["freq"])
        for r in QUERIES["x4_bpe_train_rounds"](spark, sf).collect()
    ]
    assert got == [(1, "t h", 4), (2, "th e", 3), (3, "a n", 1)]


def test_base_items_single_pass_multi_field(spark):
    """base_items melts ALL fields into one long-form count — the
    per-field modal values and NULL-when-absent behavior must be
    identical to the per-field round-9 derivation, including a field
    that is null for a whole collection while another field isn't."""
    from recipes_spark.plans.hydrate import base_items

    rows = [
        ("a", "c1", "x", "p1"),
        ("b", "c1", "x", None),
        ("c", "c1", "y", None),
        ("d", "c2", None, "p2"),
        ("e", "c2", None, "p2"),
    ]
    df = spark.createDataFrame(
        rows, "id string, collection_id string, v string, plat string"
    )
    got = {
        r["collection_id"]: (r["base_v"], r["base_plat"])
        for r in base_items(df, ["v", "plat"]).collect()
    }
    assert got == {"c1": ("x", "p1"), "c2": (None, "p2")}


def test_base_items_is_one_item_scan(spark):
    """The melt's whole point: exactly ONE scan of the item relation
    feeds the count aggregate regardless of field count. The item
    frame appears once in the long-form plan (plus the bounded
    collection-id distinct), never once per field."""
    from recipes_spark.plans.hydrate import base_items

    df = spark.createDataFrame(
        [("a", "c1", "x", "y", "z")],
        "id string, collection_id string, f1 string, f2 string, f3 string",
    )
    plan = (
        base_items(df, ["f1", "f2", "f3"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # One explode (the melt) — the round-9 shape had zero explodes and
    # F per-field aggregates instead; F>1 explodes would mean the melt
    # itself re-scans.
    assert plan.count("explode") == 1, plan


def test_dehydrate_raises_on_sentinel_source_value(spark):
    """ADVICE r9: a source value equal to the DO_NOT_MERGE sentinel
    would survive dehydrate verbatim and hydrate back to NULL — the
    engine must fail closed instead of corrupting the round-trip."""
    from recipes_spark.plans.hydrate import (
        DO_NOT_MERGE,
        base_items,
        dehydrate_items,
    )

    df = spark.createDataFrame(
        [("a", "c1", "x"), ("b", "c1", DO_NOT_MERGE)],
        "id string, collection_id string, v string",
    )
    base = base_items(df, ["v"])
    with pytest.raises(Exception, match="DO_NOT_MERGE"):
        dehydrate_items(df, base, ["v"]).collect()
