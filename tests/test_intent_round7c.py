"""Intent-level tests for the round-7 third-wave operators on PLANTED
inputs (rationale in test_intent_round7.py: the oracle gate cannot
catch both engines encoding the same wrong spec, so each operator's
defining behavior is pinned on hand-built cases where the intended and
the plausible-but-wrong semantics diverge). Also holds the quality
gates for the rows-only x3_pca_project."""

from __future__ import annotations

import datetime as dt
import math
import os

import numpy as np
from pyspark.sql import Row

from recipes_spark.registry import all_queries

QUERIES = all_queries()

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write(spark, tmp_path, name, rows, schema=None):
    df = spark.createDataFrame(rows, schema) if schema else spark.createDataFrame(rows)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), f"{name}.parquet")
    )
    return str(tmp_path)


def _events(spark, tmp_path, rows):
    """rows = (event_id, user_id, minutes_after_T0, event_type, value)."""
    return _write(
        spark,
        tmp_path,
        "events",
        [
            Row(
                event_id=i,
                ts=T0 + dt.timedelta(minutes=m),
                user_id=u,
                event_type=et,
                value=v,
                props="{}",
            )
            for i, u, m, et, v in rows
        ],
    )


# ---------------------------------------------------------------------------
# pareto_frontier
# ---------------------------------------------------------------------------


def test_pareto_keeps_only_undominated_pairs(spark, tmp_path):
    """Planted brand: (1.00,3) and (2.00,2) are the frontier; (1.00,5)
    loses to (1.00,3) on equal price (strict size), (1.50,3) loses to
    (1.00,3) on equal size (strict price) — the two tie cases where a
    strictly-less-on-both definition would WRONGLY keep the point —
    and (3.00,3) is plainly dominated. Duplicate parts at a frontier
    pair must aggregate, not duplicate."""
    rows = [
        Row(p_partkey=k, p_name=f"p{k}", p_brand="B#1", p_type="t",
            p_size=s, p_retailprice=pr)
        for k, (pr, s) in enumerate(
            [(1.0, 3), (1.0, 5), (1.5, 3), (2.0, 2), (3.0, 3), (1.0, 3)]
        )
    ]
    d = _write(spark, tmp_path, "part", rows)
    got = [
        (r["price_cents"], r["size"], r["n_parts"])
        for r in QUERIES["pareto_frontier"](spark, d).collect()
    ]
    assert got == [(100, 3, 2), (200, 2, 1)]


# ---------------------------------------------------------------------------
# event_pattern_match
# ---------------------------------------------------------------------------


def test_pattern_requires_order_and_hop_windows(spark, tmp_path):
    """Four planted users, one purchase each: (1) clean
    view->click->purchase converts; (2) click BEFORE view does not
    (order matters — a bag-of-events funnel would match); (3) click
    25h after view is never qualified; (4) purchase 25h after a
    qualified click does not convert (per-hop window, not
    total-window)."""
    h25 = 25 * 60
    rows = [
        (0, 1, 0, "view", 1.0), (1, 1, 10, "click", 1.0),
        (2, 1, 20, "purchase", 1.0),
        (3, 2, 0, "click", 1.0), (4, 2, 10, "view", 1.0),
        (5, 2, 20, "purchase", 1.0),
        (6, 3, 0, "view", 1.0), (7, 3, h25, "click", 1.0),
        (8, 3, h25 + 10, "purchase", 1.0),
        (9, 4, 0, "view", 1.0), (10, 4, 10, "click", 1.0),
        (11, 4, 10 + h25, "purchase", 1.0),
    ]
    d = _events(spark, tmp_path, rows)
    got = {
        r["user_id"]: (r["n_purchase"], r["n_converted"])
        for r in QUERIES["event_pattern_match"](spark, d).collect()
    }
    assert got == {1: (1, 1), 2: (1, 0), 3: (1, 0), 4: (1, 0)}


# ---------------------------------------------------------------------------
# x7_sssp_khop
# ---------------------------------------------------------------------------


def test_sssp_matches_pure_python_bellman_ford(spark, tmp_path):
    """The derived graph for n=30, relaxed 6 rounds by an independent
    pure-Python Bellman-Ford over the same arithmetic edge families —
    distances AND the reachable set must agree exactly."""
    n = 30
    d = _write(spark, tmp_path, "documents",
               [Row(doc_id=i) for i in range(n)])
    edges = {}
    for u in range(n):
        for dst, w in [
            ((u + 1) % n, u % 7 + 1),
            ((u + 2) % n, (u + 3) % 7 + 1),
            ((u * u + 1) % n, (u + 6) % 7 + 1),
            ((u * 7 + 1) % n, (u + 9) % 7 + 1),
        ]:
            if dst != u:
                edges[(u, dst)] = min(edges.get((u, dst), w), w)
    dist = {0: 0}
    for _ in range(6):
        nxt = dict(dist)
        for (u, v), w in edges.items():
            if u in dist and dist[u] + w < nxt.get(v, math.inf):
                nxt[v] = dist[u] + w
        dist = nxt
    got = {
        r["node"]: r["dist"]
        for r in QUERIES["x7_sssp_khop"](spark, d).collect()
    }
    assert got == dist


# ---------------------------------------------------------------------------
# g6_grid_knn
# ---------------------------------------------------------------------------


def test_grid_knn_equals_brute_force_in_sparse_regime(spark, tmp_path):
    """400 points over the 10x10 grid is ~4 sites per cell: many 3x3
    blocks cannot certify their winner (or are empty), so the
    fallback leg genuinely fires — and the combined result must still
    equal the all-pairs brute force with the (d2, site_id) tiebreak."""
    ids = list(range(400))
    d = _events(spark, tmp_path, [(i, 1, i, "view", 1.0) for i in ids])
    pts = {i: ((i * 48271) % 10000, (i * 16807) % 10000) for i in ids}
    expect = {}
    for q in ids:
        if q % 101 != 0:
            continue
        qx, qy = pts[q]
        best = min(
            ((sx - qx) ** 2 + (sy - qy) ** 2, s)
            for s, (sx, sy) in pts.items()
            if s % 101 != 0
        )
        expect[q] = best
    got = {
        r["query_id"]: (r["d2"], r["site_id"])
        for r in QUERIES["g6_grid_knn"](spark, d).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# agg_welch_ttest / agg_mannwhitney
# ---------------------------------------------------------------------------


def test_welch_matches_closed_form(spark, tmp_path):
    """Planted samples hi=[10,12,14], lo=[20,22,24,26]: the emitted
    micros must equal the same IEEE expression evaluated in Python."""
    rows = [
        Row(l_returnflag="A", l_discount=disc, l_quantity=float(q),
            l_orderkey=i, l_extendedprice=1.0)
        for i, (disc, q) in enumerate(
            [(0.06, 10), (0.06, 12), (0.06, 14),
             (0.0, 20), (0.0, 22), (0.0, 24), (0.0, 26)]
        )
    ]
    d = _write(spark, tmp_path, "lineitem", rows)
    r = QUERIES["agg_welch_ttest"](spark, d).collect()[0]
    n1, n2 = 3, 4
    s1, s2 = 36.0, 92.0
    q1, q2 = float(100 + 144 + 196), float(400 + 484 + 576 + 676)
    m1, m2 = s1 / n1, s2 / n2
    v1 = (q1 - s1 * s1 / n1) / (n1 - 1)
    v2 = (q2 - s2 * s2 / n2) / (n2 - 1)
    se2 = v1 / n1 + v2 / n2
    t_micro = math.floor(1000000.0 * (m1 - m2) / math.sqrt(se2))
    df_micro = math.floor(
        1000000.0 * se2 * se2
        / ((v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1))
    )
    assert (r["n1"], r["n2"]) == (n1, n2)
    assert r["t_micro"] == t_micro
    assert r["df_micro"] == df_micro


def test_mannwhitney_handles_ties_via_doubled_midranks(spark, tmp_path):
    """even-user values [1,2,2] vs odd-user [2,3]: U1 = 1 (one tie pair
    counts half twice), so u1_twice must be exactly 2 — the case where
    naive rank() (no midrank correction) gives a different integer."""
    rows = [
        (0, 2, 0, "view", 1.0), (1, 4, 1, "view", 2.0),
        (2, 6, 2, "view", 2.0),
        (3, 1, 3, "view", 2.0), (4, 3, 4, "view", 3.0),
    ]
    d = _events(spark, tmp_path, rows)
    r = QUERIES["agg_mannwhitney"](spark, d).collect()[0]
    assert (r["n1"], r["n2"], r["u1_twice"]) == (3, 2, 2)


# ---------------------------------------------------------------------------
# x3_embedding_covariance / x3_pca_project
# ---------------------------------------------------------------------------


def _mini_embeddings(spark, tmp_path, n=7, dim=5):
    vecs = [
        [((i * 31 + j * 17) % 13 - 6) / 8.0 for j in range(dim)]
        for i in range(n)
    ]
    _write(
        spark, tmp_path, "embeddings",
        [Row(vec_id=i, embedding=v, label=0) for i, v in enumerate(vecs)],
        schema="vec_id long, embedding array<float>, label int",
    )
    return np.floor(np.asarray(vecs, dtype=np.float32).astype(np.float64) * 1e6)


def test_covariance_equals_numpy_definition(spark, tmp_path):
    """Engine cov_n vs n*Q^T Q - outer(S,S) computed directly in numpy
    over the identical float32->float64->floor quantization — exact
    integer equality, any dimension (dim=5 here, so the query must
    not hard-code 64 on the engine side)."""
    Q = _mini_embeddings(spark, tmp_path)
    n, dim = Q.shape
    Qi = Q.astype(np.int64)
    C = n * (Qi.T @ Qi) - np.outer(Qi.sum(0), Qi.sum(0))
    got = QUERIES["x3_embedding_covariance"](spark, str(tmp_path)).collect()
    assert len(got) == dim * (dim + 1) // 2
    for r in got:
        assert r["cov_n"] == C[r["i"] - 1, r["j"] - 1], (r["i"], r["j"])


def test_pca_projection_gates(spark, tmp_path):
    """Exactness gates for the round-15 form (served from the
    fixed-point top-2 siblings): (a) output equals an independent
    pure-Python integer replay — Gram/sums computed directly from the
    quantized matrix, _powit_top2_vectors' recurrence, truncating
    max-normalization — on a dim≠64 fixture (so nothing hard-codes
    64); (b) deterministic across reruns."""
    from recipes_spark.queries.dataops import _powit_top2_vectors, _tdiv

    Q = _mini_embeddings(spark, tmp_path)
    n, dim = Q.shape
    Qi = Q.astype(object)  # Python bigints, like the engine replay
    G = Qi.T @ Qi
    S = Qi.sum(0)
    merged = [
        {"i": i + 1, "j": j + 1, "sij": int(G[i, j]), "n": n}
        for i in range(dim)
        for j in range(i, dim)
    ] + [
        {"i": i + 1, "j": 0, "sij": int(S[i]), "n": 0} for i in range(dim)
    ]
    v, u, mu, _ = _powit_top2_vectors(merged)
    mx1 = max(abs(x) for x in v)
    mx2 = max(abs(x) for x in u)
    expect = {
        i: (
            _tdiv(sum(int(v[j]) * (int(Qi[i, j]) - mu[j]) for j in range(dim)), mx1),
            _tdiv(sum(int(u[j]) * (int(Qi[i, j]) - mu[j]) for j in range(dim)), mx2),
        )
        for i in range(n)
    }
    got = QUERIES["x3_pca_project"](spark, str(tmp_path)).collect()
    got2 = QUERIES["x3_pca_project"](spark, str(tmp_path)).collect()
    assert got == got2
    assert {
        int(r["vec_id"]): (int(r["pc1_micro"]), int(r["pc2_micro"]))
        for r in got
    } == expect


# ---------------------------------------------------------------------------
# x7_kcore / window_ewma / join_asof_tolerance
# ---------------------------------------------------------------------------


def test_kcore_equals_python_fixpoint(spark, tmp_path):
    """n=40 planted docs: pure-Python peeling TO THE FIXED POINT must
    equal the engine's 8-round answer — both the surviving set and the
    in-core degrees (proves 8 rounds suffice, i.e. the round cap is
    not silently truncating the peel)."""
    n = 40
    d = _write(spark, tmp_path, "documents",
               [Row(doc_id=i) for i in range(n)])
    edges = set()
    for u in range(n):
        for v in [(u + 1) % n, (u + 2) % n, (u * u + 1) % n, (u * 7 + 1) % n]:
            if u != v:
                edges.add((min(u, v), max(u, v)))
    alive = set(range(n))
    while True:
        deg = {x: 0 for x in alive}
        for a, b in edges:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        nxt = {x for x in alive if deg[x] >= 3}
        if nxt == alive:
            break
        alive = nxt
    deg = {x: 0 for x in alive}
    for a, b in edges:
        if a in alive and b in alive:
            deg[a] += 1
            deg[b] += 1
    got = {
        r["node"]: r["core_degree"]
        for r in QUERIES["x7_kcore"](spark, d).collect()
    }
    assert got == deg


def test_ewma_closed_form_and_horizon(spark, tmp_path):
    """One supplier, constant q=1 over 20 rows: once the horizon is
    full the EWMA must saturate at 2^16 - 1 (sum of 16 powers of two)
    and the first row must be exactly 2^15 — pinning both the weight
    orientation (newest = heaviest) and the 16-row truncation."""
    rows = [
        Row(l_suppkey=0, l_orderkey=i, l_linenumber=1, l_quantity=1.0,
            l_shipdate=T0 + dt.timedelta(days=i), l_returnflag="N",
            l_discount=0.0, l_extendedprice=1.0)
        for i in range(20)
    ]
    d = _write(spark, tmp_path, "lineitem", rows)
    got = [
        r["ewma_scaled"]
        for r in QUERIES["window_ewma"](spark, d).collect()
    ]
    assert got[0] == 1 << 15
    assert got[15:] == [(1 << 16) - 1] * 5


def test_asof_tolerance_nulls_stale_matches(spark, tmp_path):
    """user 1: error 1h before the click -> carried; user 2: error 3h
    before -> present in the unbounded as-of but MUST be nulled by the
    2h tolerance; user 3: no error at all -> same NULL shape as
    stale."""
    rows = [
        (0, 1, 0, "error", 7.0), (1, 1, 60, "click", 1.0),
        (2, 2, 0, "error", 8.0), (3, 2, 180, "click", 1.0),
        (4, 3, 0, "view", 1.0), (5, 3, 60, "click", 1.0),
    ]
    d = _events(spark, tmp_path, rows)
    got = {
        r["user_id"]: (r["asof_ts"] is not None, r["asof_value"])
        for r in QUERIES["join_asof_tolerance"](spark, d).collect()
    }
    assert got == {1: (True, 7.0), 2: (False, None), 3: (False, None)}


# ---------------------------------------------------------------------------
# snapshot_vacuum lifecycle
# ---------------------------------------------------------------------------


def test_vacuum_frees_nothing_until_rewrite_then_expires_history(
    spark, tmp_path
):
    """Append-only manifests reference every file forever, so vacuum
    must delete ZERO files before a rewrite commit; after a
    replace=True full-table rewrite, vacuum deletes the dereferenced
    files, the retained version still reads the complete table, and
    reading an expired version fails loudly (not silently empty)."""
    import pytest

    from recipes_spark.plans.catalog import (
        snapshot_commit,
        snapshot_read,
        snapshot_vacuum,
    )

    store = os.path.join(str(tmp_path), "store")
    a = spark.createDataFrame([(i, "a") for i in range(10)], "id long, s string")
    b = spark.createDataFrame([(i, "b") for i in range(10, 20)], "id long, s string")
    snapshot_commit(spark, a.repartition(2), store, 1)
    snapshot_commit(spark, b.repartition(2), store, 2)
    stats = snapshot_vacuum(spark, store, retain_from=2)
    assert stats["files_deleted"] == 0 and stats["manifests_dropped"] == 1
    assert snapshot_read(spark, store, 2).count() == 20

    snapshot_commit(
        spark, snapshot_read(spark, store, 2).repartition(2), store, 3,
        replace=True,
    )
    stats = snapshot_vacuum(spark, store, retain_from=3)
    assert stats["files_deleted"] == 4
    assert stats["files_retained"] == 2
    got = sorted(r["id"] for r in snapshot_read(spark, store, 3).collect())
    assert got == list(range(20))
    with pytest.raises(Exception):
        snapshot_read(spark, store, 2).collect()
