"""Intent-level tests for the round-7 fourth-wave operators on PLANTED
inputs (rationale in test_intent_round7.py): each operator's defining
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
    df = spark.createDataFrame(rows, schema) if schema else spark.createDataFrame(rows)
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


def test_anomaly_stats_use_zero_filled_grid(spark, tmp_path):
    """One type with events only in hours 0 and 48 (10 and 2 events),
    46 empty hours between: over the ZERO-FILLED grid the mean is
    ~0.25 and hour 0 is a screaming anomaly; over observed-only
    buckets the mean would be 6 and NOTHING would flag — the wrong
    version returns an empty report."""
    rows = [(i, 1, 0 + i, "view", 1.0) for i in range(10)]
    rows += [(100, 1, 48 * 60, "view", 1.0), (101, 1, 48 * 60 + 1, "view", 1.0)]
    d = _events(spark, tmp_path, rows)
    got = QUERIES["event_anomaly_buckets"](spark, d).collect()
    assert [r["bucket"] - got[0]["bucket"] for r in got] == [0]
    assert got[0]["n"] == 10


def test_cusum_accumulates_sustained_drift_not_single_spikes(spark, tmp_path):
    """k = ceil(mean): a single large spike resets through the
    running-min drain, but a SUSTAINED +2-above-slack run crosses the
    alarm; verify against a pure-Python sequential
    s = max(0, s + x - k) reference on the same zero-filled series —
    the closed form must equal the recurrence everywhere."""
    # hours 0..39: baseline 1/hour; hours 40..59: 4/hour sustained
    rows = []
    eid = 0
    for h in range(40):
        rows.append((eid, 1, h * 60, "view", 1.0)); eid += 1
    for h in range(40, 60):
        for j in range(4):
            rows.append((eid, 1, h * 60 + j, "view", 1.0)); eid += 1
    d = _events(spark, tmp_path, rows)
    xs = [1] * 40 + [4] * 20
    n = len(xs)
    k = -(-sum(xs) // n)  # ceil mean
    s, ref = 0, []
    for x in xs:
        s = max(0, s + x - k)
        ref.append(s)
    expect = {h: s for h, s in enumerate(ref) if s >= 10}
    got = {
        r["bucket"] - int(T0.timestamp() // 3600): r["cusum"]
        for r in QUERIES["window_cusum"](spark, d).collect()
    }
    assert got == expect
    assert expect, "planted drift must actually alarm"


def test_benford_reports_missing_digits(spark, tmp_path):
    """All prices start with digit 1: digits 2..9 must still appear
    with n_obs = 0 (a LEFT join from the digit spec) — dropping them
    hides the strongest fraud signal — and the chi-square total must
    count their full expected mass."""
    rows = [
        Row(l_returnflag="N", l_linestatus="O", l_quantity=1.0,
            l_extendedprice=1.0 + i / 100.0, l_discount=0.0, l_tax=0.0,
            l_orderkey=i, l_partkey=1, l_suppkey=1, l_linenumber=1,
            l_shipdate=T0)
        for i in range(50)
    ]
    d = _write(spark, tmp_path, "lineitem", rows)
    got = {r["digit"]: r for r in QUERIES["agg_benford"](spark, d).collect()}
    assert sorted(got) == list(range(1, 10))
    assert got[1]["n_obs"] == 50
    assert all(got[d]["n_obs"] == 0 for d in range(2, 10))
    # zero-observation digits contribute (0-e)^2/e = e each
    assert all(got[d]["chi2_part_micro"] > 0 for d in range(2, 10))


def test_balanced_resample_hits_target_exactly(spark, tmp_path):
    """Classes of 7, 3, and 1 docs: every class must land on EXACTLY 7
    (the fractional-weight oversampler that rounds per row cannot
    guarantee this), and the singleton class replicates 7x."""
    rows = [
        Row(doc_id=i, lang=lang, text=f"t{i}", source="s", n_chars=10)
        for i, lang in enumerate(["a"] * 7 + ["b"] * 3 + ["c"])
    ]
    d = _write(spark, tmp_path, "documents", rows)
    got = {
        r["lang"]: (r["n_after"], r["max_copies"])
        for r in QUERIES["x6_balanced_resample"](spark, d).collect()
    }
    assert got["a"] == (7, 1)
    assert got["b"][0] == 7
    assert got["c"] == (7, 7)


def test_winsorized_clamps_instead_of_trimming(spark, tmp_path):
    """20 values: 18 at $1.00, outliers $0.01 and $100.00. The
    winsorized mean must clamp both tails to the p5/p95 cut values
    (here $0.01 stays its own cut at rank 1 and $100 clamps DOWN to
    $1.00), keep n = 20, and land strictly between the raw mean and
    the trimmed-only-high version."""
    prices = [0.01] + [1.0] * 18 + [100.0]
    rows = [
        Row(l_returnflag="N", l_extendedprice=p, l_quantity=1.0,
            l_discount=0.0, l_orderkey=i)
        for i, p in enumerate(prices)
    ]
    d = _write(spark, tmp_path, "lineitem", rows)
    r = QUERIES["agg_winsorized_mean"](spark, d).collect()[0]
    assert r["n"] == 20
    assert r["lo_cents"] == 1 and r["hi_cents"] == 100
    # clamped: one 1-cent + nineteen 100-cent values
    assert r["winsorized_mean_micro"] == (1000000 * (1 + 19 * 100)) // 20


def test_threshold_curve_is_monotone_and_integer_cut(spark, tmp_path):
    """Two identical docs (J = 1.0) and one unrelated: pair counts
    must be monotone non-increasing in the threshold and the exact
    pair must survive at 0.9 while the unrelated pair never enters."""
    rows = [
        Row(doc_id=0, lang="en", source="s", text="alpha beta gamma delta",
            n_chars=22),
        Row(doc_id=1, lang="en", source="s", text="alpha beta gamma delta",
            n_chars=22),
        Row(doc_id=2, lang="en", source="s",
            text="zzz yyy xxx www vvv uuu", n_chars=23),
    ]
    d = _write(spark, tmp_path, "documents", rows)
    got = {
        r["thr"]: (r["n_pairs"], r["n_docs"])
        for r in QUERIES["x2_dedup_threshold_curve"](spark, d).collect()
    }
    counts = [got[t][0] for t in sorted(got)]
    assert counts == sorted(counts, reverse=True)
    assert got[9000] == (1, 2)


def test_shard_checksum_detects_reorder_and_mutation(spark, tmp_path):
    """Same docs, one with two texts swapped between doc ids: every
    shard containing a swapped doc must change its digest (the
    order-sensitivity the record separator + id sort provide)."""
    base = [
        Row(doc_id=i, lang="en", source="s", text=f"text number {i}",
            n_chars=12)
        for i in range(40)
    ]
    d1 = _write(spark, os.path.join(str(tmp_path), "a"), "documents", base)
    swapped = list(base)
    swapped[3], swapped[17] = (
        Row(doc_id=3, lang="en", source="s", text=base[17]["text"], n_chars=12),
        Row(doc_id=17, lang="en", source="s", text=base[3]["text"], n_chars=12),
    )
    d2 = _write(spark, os.path.join(str(tmp_path), "b"), "documents", swapped)
    c1 = {r["shard"]: r["checksum"]
          for r in QUERIES["x6_shard_checksums"](spark, d1).collect()}
    c2 = {r["shard"]: r["checksum"]
          for r in QUERIES["x6_shard_checksums"](spark, d2).collect()}
    import hashlib
    s3 = int(hashlib.sha256(b"3").hexdigest()[:8], 16) % 8
    s17 = int(hashlib.sha256(b"17").hexdigest()[:8], 16) % 8
    touched = {s3, s17}
    for shard in c1:
        if shard in touched:
            assert c1[shard] != c2[shard]
        else:
            assert c1[shard] == c2[shard]


# ---------------------------------------------------------------------------
# agg_ratio_delta / x3_embedding_drift / x3_triplet_mining /
# event_trigram_paths
# ---------------------------------------------------------------------------


def test_ratio_delta_matches_closed_form_with_user_covariance(
    spark, tmp_path
):
    """Planted users whose x scales with y (strong per-user
    correlation): the reported z must equal the delta-method closed
    form evaluated in Python — which differs sharply from the naive
    per-event binomial z the wrong version computes."""
    import math

    # variant 0 (even users): per-user (purchases, clicks)
    v0 = {2: (1, 10), 4: (2, 20), 6: (3, 30)}
    v1 = {1: (2, 10), 3: (4, 20), 5: (6, 30)}
    rows, eid = [], 0
    for users in (v0, v1):
        for u, (x, y) in users.items():
            for _ in range(x):
                rows.append((eid, u, eid, "purchase", 1.0)); eid += 1
            for _ in range(y):
                rows.append((eid, u, eid, "click", 1.0)); eid += 1
    d = _events(spark, tmp_path, rows)
    cust = [
        Row(c_custkey=u, c_name=f"c{u}", c_nationkey=1, c_acctbal=0.0,
            c_mktsegment="SEG")
        for u in list(v0) + list(v1)
    ]
    _write(spark, tmp_path, "customer", cust)

    def stats(users):
        xs = [x for x, _ in users.values()]
        ys = [y for _, y in users.values()]
        n = len(xs)
        sx, sy = float(sum(xs)), float(sum(ys))
        sxx = float(sum(x * x for x in xs))
        syy = float(sum(y * y for y in ys))
        sxy = float(sum(x * y for x, y in users.values()))
        r = sx / sy
        var_r = (
            (sxx - sx * sx / n) / (n - 1)
            - 2 * r * ((sxy - sx * sy / n) / (n - 1))
            + r * r * ((syy - sy * sy / n) / (n - 1))
        ) / (n * (sy / n) * (sy / n))
        return r, var_r

    r0, u0 = stats(v0)
    r1, u1 = stats(v1)
    z = math.floor(1000000.0 * (r1 - r0) / math.sqrt(u0 + u1))
    got = QUERIES["agg_ratio_delta"](spark, d).collect()[0]
    assert (got["n0"], got["n1"]) == (3, 3)
    assert got["r0_micro"] == math.floor(1000000.0 * r0)
    assert got["r1_micro"] == math.floor(1000000.0 * r1)
    assert got["z_micro"] == z


def test_embedding_drift_localizes_the_shifted_dimension(spark, tmp_path):
    """Half the vectors get +0.5 on dimension 2 only: that dimension's
    z must dominate with the right sign while every other |z| stays
    small — the per-dimension localization a whole-vector cosine
    check cannot give."""
    rows = []
    for i in range(40):
        base = [((i * 13 + j * 7) % 11 - 5) / 16.0 for j in range(4)]
        if i % 2 == 1:
            base[1] += 0.5
        rows.append(Row(vec_id=i, embedding=base, label=0))
    d = _write(spark, tmp_path, "embeddings", rows,
               schema="vec_id long, embedding array<float>, label int")
    # engine hard-codes 64 dims only in the ORACLE; the engine side
    # adapts — call the query fn directly on 4-dim vectors
    got = {r["i"]: r["z_micro"]
           for r in QUERIES["x3_embedding_drift"](spark, d).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[2] > 5_000_000  # the shifted dim screams (z > 5)
    for i in (1, 3, 4):
        assert abs(got[i]) < got[2] / 4


def test_triplet_mining_hardest_and_violation(spark, tmp_path):
    """Four planted 1-D vectors: label 0 at {0.0, 0.9}, label 1 at
    {1.0}, label 9 at {0.1}: anchor 0 (vec 0.0) has hardest positive
    0.9 (far same-label) and hardest negative 0.1 (near diff-label) —
    a VIOLATION; ids chosen so naive nearest-anything would differ."""
    rows = [
        Row(vec_id=0, embedding=[0.0], label=0),
        Row(vec_id=5, embedding=[0.9], label=0),
        Row(vec_id=7, embedding=[1.0], label=1),
        Row(vec_id=9, embedding=[0.1], label=9),
    ]
    d = _write(spark, tmp_path, "embeddings", rows,
               schema="vec_id long, embedding array<float>, label int")
    got = {r["anchor"]: r
           for r in QUERIES["x3_triplet_mining"](spark, d).collect()}
    # anchors are vec_id % 5 == 0 -> {0, 5}
    assert set(got) == {0, 5}
    a = got[0]
    assert a["hard_pos"] == 5 and a["hard_neg"] == 9
    assert a["is_violation"] == 1
    b = got[5]
    assert b["hard_pos"] == 0 and b["hard_neg"] == 7
    assert b["is_violation"] == 1


def test_trigram_paths_use_order_not_bag(spark, tmp_path):
    """One user with path view, click, purchase, click: trigrams are
    exactly (view,click,purchase) and (click,purchase,click) — a
    bag-of-3 version would also emit unordered combinations."""
    rows = [
        (0, 1, 0, "view", 1.0), (1, 1, 10, "click", 1.0),
        (2, 1, 20, "purchase", 1.0), (3, 1, 30, "click", 1.0),
    ]
    d = _events(spark, tmp_path, rows)
    got = {(r["a"], r["b"], r["c"]): r["n"]
           for r in QUERIES["event_trigram_paths"](spark, d).collect()}
    assert got == {
        ("view", "click", "purchase"): 1,
        ("click", "purchase", "click"): 1,
    }


# ---------------------------------------------------------------------------
# agg_anova_f / x4_vocab_coverage_curve / x7_pagerank_personalized /
# x6_quality_mixture
# ---------------------------------------------------------------------------


def test_anova_matches_closed_form(spark, tmp_path):
    """Two planted groups with clearly different means: F must equal
    the same fixed expression evaluated in Python (per-group terms
    floored to micros first, as the engine specifies)."""
    import math

    ga = [10, 12, 14]
    gb = [30, 32, 34, 36]
    rows = [
        Row(doc_id=i, lang="a" if i < 3 else "b", source="s",
            text="t", n_chars=x)
        for i, x in enumerate(ga + gb)
    ]
    d = _write(spark, tmp_path, "documents", rows)
    r = QUERIES["agg_anova_f"](spark, d).collect()[0]
    groups = [ga, gb]
    nt = sum(len(g) for g in groups)
    k = len(groups)
    st = float(sum(sum(g) for g in groups))
    qt = float(sum(x * x for g in groups for x in g))
    sg = sum(
        math.floor(1000000.0 * float(sum(g)) * sum(g) / len(g))
        for g in groups
    ) / 1000000.0
    f = math.floor(
        1000000.0 * ((sg - st * st / nt) / (k - 1)) / ((qt - sg) / (nt - k))
    )
    assert (r["nt"], r["k"], r["df_between"], r["df_within"]) == (7, 2, 1, 5)
    assert r["f_micro"] == f


def test_coverage_curve_clamps_beyond_vocab(spark, tmp_path):
    """Vocabulary of 3 terms with masses 6/3/1: coverage at k=5..30
    must read full mass (clamp), and a planted k within the vocab
    would give the partial mass — verified via the k=5 row equaling
    10000 bp and total_tokens = 10."""
    rows = [
        Row(doc_id=0, lang="en", source="s",
            text="x x x x x x y y y z", n_chars=19),
    ]
    d = _write(spark, tmp_path, "documents", rows)
    got = {r["k"]: (r["coverage_bp"], r["total_tokens"])
           for r in QUERIES["x4_vocab_coverage_curve"](spark, d).collect()}
    assert all(got[k] == (10000, 10) for k in got)
    assert set(got) == {5, 10, 15, 20, 25, 30}


def test_personalized_pagerank_matches_integer_replay(spark, tmp_path):
    """n=20 planted docs: replicate the exact integer PPR loop in pure
    Python (same edges, same truncating divisions, 10 rounds) — every
    emitted rank must be bit-equal, and mass must concentrate on the
    seed's neighborhood (seed node 0 ranks first)."""
    n = 20
    d = _write(spark, tmp_path, "documents",
               [Row(doc_id=i) for i in range(n)])
    nodes = list(range(n))
    edges = {}
    for u in nodes:
        for v in ((u * u + 1) % n, (u * 7 + 1) % n):
            if v in nodes:
                edges.setdefault(u, []).append(v)
    seeds = [u for u in nodes if u % 50 == 0]
    ns = len(seeds)
    r = {u: (1000000 // ns if u in seeds else 0) for u in nodes}
    for _ in range(10):
        contrib = {u: 0 for u in nodes}
        for u, outs in edges.items():
            for v in outs:
                contrib[v] += (85 * r[u]) // 200
        r = {
            u: (150000 // ns if u in seeds else 0) + contrib[u]
            for u in nodes
        }
    expect = {u: v for u, v in r.items() if v > 0}
    got = {
        row["node"]: row["rank_micro"]
        for row in QUERIES["x7_pagerank_personalized"](spark, d).collect()
    }
    assert got == expect
    top = max(got, key=lambda u: (got[u], -u))
    assert top == 0  # the seed holds the most mass


def test_quality_mixture_downweights_junk_volume(spark, tmp_path):
    """A big source of junk (fails the quality bar) vs a small clean
    source: the clean source must take the larger mixture weight even
    with fewer raw tokens — the behavior plain token-share
    temperature mixing cannot produce."""
    clean_text = " ".join(["tok"] * 60)          # 60 tokens, passes
    junk_text = " ".join(["j"] * 40)             # fails n_chars bar
    rows = [
        Row(doc_id=i, lang="en", source="bigjunk", text=junk_text,
            n_chars=79)
        for i in range(20)
    ] + [
        Row(doc_id=100 + i, lang="en", source="smallclean",
            text=clean_text, n_chars=239)
        for i in range(3)
    ]
    d = _write(spark, tmp_path, "documents", rows)
    got = {r["source"]: r for r in
           QUERIES["x6_quality_mixture"](spark, d).collect()}
    assert got["bigjunk"]["n_pass"] == 0
    assert got["smallclean"]["n_pass"] == 3
    assert got["smallclean"]["weight_ppm"] > got["bigjunk"]["weight_ppm"]


def test_ks_evaluates_ecdf_after_all_ties(spark, tmp_path):
    """hi = [1, 2], lo = [2, 3]: at x=2 BOTH samples' ties must be
    absorbed before the ECDF is read (D = 1/2); evaluating per row
    in arrival order can see the spurious intermediate gap of 1.
    Closed form: diffs |c1*n2 - c2*n1| over x in {1,2,3} are 2, 2, 0
    -> d_num = 2, d_micro = 500000."""
    rows = [
        Row(l_returnflag="A", l_discount=d, l_quantity=float(q),
            l_orderkey=i, l_extendedprice=1.0)
        for i, (d, q) in enumerate(
            [(0.06, 1), (0.06, 2), (0.0, 2), (0.0, 3)]
        )
    ]
    d = _write(spark, tmp_path, "lineitem", rows)
    r = QUERIES["agg_ks_test"](spark, d).collect()[0]
    assert (r["n1"], r["n2"], r["d_num"], r["d_micro"]) == (2, 2, 2, 500000)
