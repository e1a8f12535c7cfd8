"""Intent-level tests for round-8 operators on PLANTED inputs
(rationale in test_intent_round7.py): each operator's defining
semantic is pinned where the intended and the plausible-but-wrong
versions diverge."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import Row

from recipes_spark.registry import all_queries

QUERIES = all_queries()

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write(spark, tmp_path, name, rows, schema=None):
    df = (
        spark.createDataFrame(rows, schema)
        if schema
        else spark.createDataFrame(rows)
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), f"{name}.parquet")
    )
    return str(tmp_path)


def _events(spark, tmp_path, rows):
    """rows = (event_id, user_id, minutes_after_T0, event_type, value)."""
    return _write(
        spark, tmp_path, "events",
        [
            Row(event_id=i, ts=T0 + dt.timedelta(minutes=m), user_id=u,
                event_type=et, value=v, props="{}")
            for i, u, m, et, v in rows
        ],
    )


def _docs(spark, tmp_path, texts):
    return _write(
        spark, tmp_path, "documents",
        [
            Row(doc_id=i, text=t, lang="en", source="src0",
                n_chars=len(t))
            for i, t in enumerate(texts)
        ],
    )


def test_changepoint_finds_planted_level_shift(spark, tmp_path):
    """Level 1/hour for hours 0..29, level 5/hour for hours 30..59: the
    SSE-minimizing split is exactly the last bucket of the low regime
    (bucket 29 — candidates split AFTER k), with left mean 1 and right
    mean 5. A per-candidate re-scan that skipped zero-filling or
    ranked on an off-by-one prefix would land elsewhere."""
    rows = []
    eid = 0
    for h in range(60):
        per = 1 if h < 30 else 5
        for j in range(per):
            rows.append((eid, 1, h * 60 + j, "view", 1.0))
            eid += 1
    d = _events(spark, tmp_path, rows)
    got = {r["event_type"]: r for r in QUERIES["ts_changepoint"](spark, d).collect()}
    r = got["view"]
    epoch_hour_t0 = int(
        (T0 - dt.datetime(1970, 1, 1)).total_seconds() // 3600
    )
    assert r["split_bucket"] == epoch_hour_t0 + 29, r
    assert r["left_mean_micro"] == 1_000_000
    assert r["right_mean_micro"] == 5_000_000
    assert r["cost_micro"] == 0  # both segments are perfectly flat


def test_changepoint_prefers_earliest_bucket_on_ties(spark, tmp_path):
    """A constant series has identical (maximal) cost at every split —
    the argmin must break ties to the EARLIEST bucket, not whichever
    partition happened to answer first."""
    rows = [(h, 1, h * 60, "view", 1.0) for h in range(24)]
    d = _events(spark, tmp_path, rows)
    r = QUERIES["ts_changepoint"](spark, d).collect()[0]
    first_bucket = int(
        (T0 - dt.datetime(1970, 1, 1)).total_seconds() // 3600
    )
    assert r["split_bucket"] == first_bucket
    assert r["cost_micro"] == 0  # constant series: zero SSE everywhere


def test_top_ngram_fraction_catches_looping_phrase(spark, tmp_path):
    """A doc that loops one bigram has top_frac ~ its whole length even
    though its token-level repetition (distinct/total) looks identical
    to a doc with scattered duplicates — the signal x4_repetition_score
    cannot see. Also pins the tie rule (lexicographically smallest
    gram) and dup_frac covering ALL repeated grams."""
    looping = "ab cd " * 20 + "tail"          # one bigram dominates
    scattered = " ".join(f"w{i}" for i in range(41))  # all grams unique
    d = _docs(spark, tmp_path, [looping.strip(), scattered])
    rows = QUERIES["x4_top_ngram_fraction"](spark, d).collect()
    by = {(r["doc_id"], r["n"]): r for r in rows}
    loop2 = by[(0, 2)]
    assert loop2["top_gram"] in ("ab cd", "cd ab")
    assert loop2["top_frac_micro"] > 350_000   # one gram covers >35% chars
    scat2 = by[(1, 2)]
    assert scat2["top_count"] == 1
    assert scat2["dup_frac_micro"] == 0  # no gram repeats at all
    assert loop2["dup_frac_micro"] > 1_000_000  # overlapping mass > doc


def test_gopher_filter_rules_fire_independently(spark, tmp_path):
    """Each rule must be auditable alone: four planted docs each fail
    exactly one rule, a fifth passes all. A composite-only
    implementation (single boolean) could not tell them apart."""
    good = "the a of and " + " ".join(f"word{i}" for i in range(34))
    short = "the and brief note"                        # < 30 words
    longwords = ("the and " + "extraordinarily " * 40)  # mean word len > 5.5
    loop = "the and " + "spam " * 60                    # dup fraction > 0.4
    nostops = " ".join(f"tok{i}" for i in range(40))  # no stopwords
    d = _docs(
        spark, tmp_path,
        [good.strip(), short, longwords.strip(), loop.strip(), nostops],
    )
    rows = {r["doc_id"]: r for r in QUERIES["x4_gopher_filter"](spark, d).collect()}
    assert rows[0]["keep"] is True
    assert rows[1]["ok_length"] is False and rows[1]["ok_stopwords"] is True
    assert rows[2]["ok_word_len"] is False and rows[2]["ok_length"] is True
    assert rows[3]["ok_repetition"] is False
    assert rows[4]["ok_stopwords"] is False and rows[4]["ok_repetition"] is True
    assert all(not rows[i]["keep"] for i in (1, 2, 3, 4))


def test_kanon_release_pools_small_cells_and_reconciles(spark, tmp_path):
    """Cells below k must NEVER appear individually, and released +
    pooled totals must reconcile with the corpus exactly."""
    rows = []
    did = 0
    for lang, src, n in (
        ("en", "a", 7), ("en", "b", 5), ("de", "a", 3), ("fr", "c", 1)
    ):
        for _ in range(n):
            rows.append(Row(doc_id=did, text="t", lang=lang, source=src,
                            n_chars=1))
            did += 1
    d = _write(spark, tmp_path, "documents", rows)
    got = QUERIES["x6_kanon_release"](spark, d).collect()
    released = [r for r in got if not r["pooled"]]
    pooled = [r for r in got if r["pooled"]]
    assert {(r["lang"], r["source"], r["n_docs"]) for r in released} == {
        ("en", "a", 7), ("en", "b", 5)
    }
    assert len(pooled) == 1
    assert pooled[0]["n_docs"] == 4  # 3 + 1, never shown per-cell
    assert sum(r["n_docs"] for r in got) == 16


def test_knn_graph_neighbors_match_brute_force(spark, tmp_path):
    """The blocked self-join must produce exactly the brute-force
    neighbor lists — planted so vec 0/1 are near-duplicates and vec 5
    is orthogonal junk that must appear in nobody's top list."""
    import numpy as np

    rng = [
        [1.0, 0.0, 0.0, 0.0], [0.99, 0.14, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0], [0.1, 0.98, 0.0, 0.0],
        [0.7, 0.7, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0],
    ]
    d = _write(
        spark, tmp_path, "embeddings",
        [Row(vec_id=i, embedding=v, label=0) for i, v in enumerate(rng)],
    )
    got = QUERIES["x3_knn_graph"](spark, d).collect()
    nbrs = {}
    for r in got:
        nbrs.setdefault(r["qid"], []).append(r["cid"])
    A = np.asarray(rng)
    S = A @ A.T / (
        np.linalg.norm(A, axis=1)[:, None] * np.linalg.norm(A, axis=1)[None, :]
    )
    for q in range(6):
        order = sorted(
            (c for c in range(6) if c != q),
            key=lambda c: (-S[q, c], c),
        )[:3]
        assert nbrs[q] == order, (q, nbrs[q], order)
    assert all(5 not in v for k, v in nbrs.items() if k != 5)


def test_spearman_perfect_monotone_and_reversal(spark, tmp_path):
    """Values strictly increasing with time → rho exactly +1 (floored
    micro = 1_000_000); strictly decreasing → −1. A row_number-based
    rank (instead of averaged rank under ties) would still pass here —
    the tie case below is what separates them: two equal values must
    share an AVERAGED rank, which shifts rho off ±1 deterministically."""
    up = [(i, 1, i * 60, "up", float(i + 1)) for i in range(10)]
    down = [(100 + i, 1, i * 60, "down", float(100 - i)) for i in range(10)]
    tied = [(200 + i, 1, i * 60, "tied", float(min(i, 8) + 1)) for i in range(10)]
    d = _events(spark, tmp_path, up + down + tied)
    rows = {r["event_type"]: r for r in QUERIES["agg_spearman"](spark, d).collect()}
    assert rows["up"]["rho_micro"] == 1_000_000
    assert rows["down"]["rho_micro"] == -1_000_000
    assert 900_000 < rows["tied"]["rho_micro"] < 1_000_000


def test_mann_kendall_saturates_on_strict_monotone(spark, tmp_path):
    """A strictly increasing hourly series has S = n_pairs (every pair
    votes up) and a positive z; the reversed series mirrors to -S."""
    up = [(i, 1, h * 60 + j, "up", 1.0)
          for i, (h, j) in enumerate((h, j) for h in range(12)
                                     for j in range(h + 1))]
    base = 10_000
    down = [(base + i, 1, h * 60 + j, "down", 1.0)
            for i, (h, j) in enumerate((h, j) for h in range(12)
                                       for j in range(12 - h))]
    d = _events(spark, tmp_path, up + down)
    rows = {r["event_type"]: r for r in QUERIES["agg_mann_kendall"](spark, d).collect()}
    u, w = rows["up"], rows["down"]
    assert u["s_stat"] == u["n_pairs"] == 66
    assert w["s_stat"] == -w["n_pairs"] == -66
    assert u["z_micro"] > 0 > w["z_micro"]
    # symmetric construction up to the floor convention:
    # floor(x) + floor(-x) = -1 for non-integer x
    assert u["z_micro"] + w["z_micro"] in (0, -1)


def test_twap_weights_by_holding_time_not_event_count(spark, tmp_path):
    """Value 1.00 held for 9 hours, then 0.00 held for 1 hour: TWAP is
    90 micro-cents per cent-unit — a plain avg(value) over the three
    events would say ~0.33. The final event contributes span, never
    weight (nothing is held after it)."""
    rows = [
        (0, 1, 0, "v", 1.00),
        (1, 1, 9 * 60, "v", 0.0),
        (2, 1, 10 * 60, "v", 55.55),  # value irrelevant: no next event
    ]
    d = _events(spark, tmp_path, rows)
    r = QUERIES["window_twap"](spark, d).collect()[0]
    h_us = 3_600_000_000
    assert r["n_events"] == 3
    assert r["span_us"] == 10 * h_us
    assert r["weighted_sum"] == 100 * 9 * h_us  # cents x holding micros
    assert r["twap_micro_cents"] == 90_000_000


def test_apportionment_exact_budget_and_remainder_ties(spark, tmp_path):
    """Masses 1/1/1 over a 1M budget: each base is 333_333 with equal
    remainders — exactly one extra unit exists and must go to the
    lexicographically smallest source; the allocations always sum to
    the budget exactly."""
    rows = [
        Row(doc_id=i, text="t", lang="en", source=s, n_chars=100)
        for i, s in enumerate(["b", "a", "c"])
    ]
    d = _write(spark, tmp_path, "documents", rows)
    got = {r["source"]: r for r in QUERIES["x6_budget_apportion"](spark, d).collect()}
    assert sum(r["alloc"] for r in got.values()) == 1_000_000
    assert [got[s]["base"] for s in "abc"] == [333_333] * 3
    assert got["a"]["extra"] == 1
    assert got["b"]["extra"] == got["c"]["extra"] == 0
