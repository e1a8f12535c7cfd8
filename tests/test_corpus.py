"""Corpus-op property checks beyond the oracle: stratified-sample
proportions and packing-plan invariants."""

from __future__ import annotations

import pyspark.sql.functions as F

from recipes_spark.io import load
from recipes_spark.registry import all_queries


def test_stratified_sample_proportions(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    totals = {r.lang: r.n for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    sampled = {
        r.lang: r.n_sampled
        for r in all_queries()["x6_stratified_sample"](spark, sf_dir).collect()
    }
    langs = sorted(totals)
    for i, lang in enumerate(langs):
        frac = 0.5 if i % 2 == 0 else 0.2
        got = sampled.get(lang, 0) / totals[lang]
        # Bernoulli tolerance: generous bounds for small strata.
        assert abs(got - frac) < 0.2, f"{lang}: {got:.2f} vs {frac}"


def test_packing_plan_conserves_tokens(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    total_tokens = d.select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).first()[0]
    plan = all_queries()["x6_packing_plan"](spark, sf_dir)
    agg = plan.agg(
        F.sum("n_tokens").alias("tok"), F.sum("n_docs").alias("docs")
    ).first()
    assert agg.tok == total_tokens
    assert agg.docs == d.count()
    # Sequence ids are dense from 0.
    seqs = [r.seq_id for r in plan.orderBy("seq_id").collect()]
    assert seqs[0] == 0
    assert seqs == sorted(seqs)


def test_contamination_detects_planted_dup(spark, sf_dir):
    """A corpus doc that shares an 8-gram with a benchmark doc must be
    flagged: doc texts are generated from a tiny vocabulary, so overlap
    exists by construction at every SF (validated here)."""
    hits = all_queries()["x4_contamination"](spark, sf_dir)
    rows = hits.collect()
    for r in rows:
        assert r.n_hits >= 1


def test_connected_components_chain_triangle_isolated(spark):
    from recipes_spark.operators.dedup import connected_components

    # Chain 1-2-3-4 (diameter 3: needs >1 propagation round),
    # triangle 10-11-12, isolated node 20.
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12, 20]], "node long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)], "src long, dst long"
    )
    got = {
        r.node: r.component
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20}


def test_connected_components_random_graphs_vs_union_find(spark):
    """Property: Spark min-label propagation equals a driver-side
    union-find on random graphs (fixed seeds — deterministic)."""
    import random

    from recipes_spark.operators.dedup import connected_components

    for seed in (7, 42, 1234):
        rng = random.Random(seed)
        n = 60
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(10, 80))
            }
        )
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # Canonical component = min node id in the component.
        comp_min: dict[int, int] = {}
        for v in range(n):
            r = find(v)
            comp_min[r] = min(comp_min.get(r, v), v)
        expect = {v: comp_min[find(v)] for v in range(n)}

        nodes_df = spark.createDataFrame([(i,) for i in range(n)], "node long")
        edges_df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r.node: r.component
            for r in connected_components(nodes_df, edges_df).collect()
        }
        assert got == expect, f"seed {seed} mismatch"


def test_hll_estimate_within_tolerance(spark, sf_dir):
    """The merged per-source HLL estimate must land within 5% of the
    exact distinct count (lgK=12 ⇒ ~1.6% rse; 5% = 3σ headroom) — the
    accuracy contract that makes sketch-merge a usable substitute for
    exact countDistinct at scale."""
    import pyspark.sql.functions as F

    from recipes_spark.io import load
    from recipes_spark.registry import all_queries

    est = all_queries()["x2_hll_mergeable_distinct"](spark, sf_dir).collect()[0]
    exact = (
        load(spark, sf_dir, "documents")
        .select(F.xxhash64("text").alias("h"))
        .distinct()
        .count()
    )
    assert abs(est.est_distinct_docs - exact) / exact < 0.05, (
        f"HLL estimate {est.est_distinct_docs} vs exact {exact}"
    )


def test_star_cc_matches_label_propagation_on_random_graphs(spark):
    """connected_components_star (large-star/small-star) must agree with
    min-label propagation on random graphs (fixed seeds)."""
    import random

    from recipes_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    for seed in (3, 99, 2024):
        rng = random.Random(seed)
        n = 60
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(5, 90))
            }
        )
        nodes_df = spark.createDataFrame([(i,) for i in range(n)], "node long")
        edges_df = spark.createDataFrame(edges, "src long, dst long")
        ref = {
            r.node: r.component
            for r in connected_components(nodes_df, edges_df).collect()
        }
        got = {
            r.node: r.component
            for r in connected_components_star(nodes_df, edges_df).collect()
        }
        assert got == ref, f"seed {seed} mismatch"


def test_star_cc_long_chain_beyond_propagation_budget(spark):
    """A 61-node path (diameter 60) exceeds label propagation's default
    25-round budget but the star algorithm contracts it in O(log n)
    rounds — no warning, exact labels."""
    import warnings as w

    from recipes_spark.operators.dedup import connected_components_star

    n = 61
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    with w.catch_warnings():
        w.simplefilter("error")  # any max_iter warning fails the test
        got = {
            r.node: r.component
            for r in connected_components_star(nodes, edges, max_iter=15).collect()
        }
    assert got == {i: 0 for i in range(n)}


def test_star_cc_empty_edges_and_isolated(spark):
    from recipes_spark.operators.dedup import connected_components_star

    nodes = spark.createDataFrame([(i,) for i in [5, 9]], "node long")
    edges = spark.createDataFrame([], "src long, dst long")
    got = {
        r.node: r.component
        for r in connected_components_star(nodes, edges).collect()
    }
    assert got == {5: 5, 9: 9}


def test_bloom_no_false_negatives_and_portable_positions(spark, sf_dir):
    """Every indexed key must bloom-test positive against its own
    bitmap (the defining bloom guarantee), and the bit positions must
    be the portable sha256-slice construction — checked by asserting a
    NON-indexed corpus's pass rate stays near the analytic false-positive
    rate (a position-math bug sends it to 0% or 100%)."""
    from recipes_spark.io import load
    from recipes_spark.operators.dedup import bloom_build, bloom_members

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    idx = d.filter("doc_id % 2 = 0")
    inc = d.filter("doc_id % 2 = 1")
    m, k = 1 << 16, 4
    bm = bloom_build(idx, "text", m_bits=m, k=k)

    n_idx = idx.count()
    # no false negatives: the index side passes in full
    assert bloom_members(idx, "text", bm, m_bits=m, k=k).count() == n_idx

    # false-positive rate ≈ (1 - e^(-k*n/m))^k; allow a wide band
    import math

    fpr = (1 - math.exp(-k * n_idx / m)) ** k
    n_inc = inc.count()
    hits = bloom_members(inc, "text", bm, m_bits=m, k=k).count()
    assert hits <= max(10, 5 * fpr * n_inc), (hits, fpr, n_inc)


def test_bloom_merge_is_bitwise_or(spark, sf_dir):
    """Shard merge contract: OR of two shard bitmaps ≡ bitmap of the
    union — the property that makes the sketch distributable."""
    import numpy as np

    from recipes_spark.io import load
    from recipes_spark.operators.dedup import bloom_build

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    m, k = 4096, 2
    a = bloom_build(d.filter("doc_id % 3 = 0"), "text", m_bits=m, k=k)
    b = bloom_build(d.filter("doc_id % 3 = 1"), "text", m_bits=m, k=k)
    both = bloom_build(d.filter("doc_id % 3 <= 1"), "text", m_bits=m, k=k)
    assert bytes(
        np.frombuffer(a, np.uint8) | np.frombuffer(b, np.uint8)
    ) == both


def test_band_rows_partition_invariant_and_edge_cases(spark):
    """The banding kernel's bhash values must be a pure function of the
    (id, set) row — invariant to partitioning and batching — because
    st12's accumulated band-hash index compares hashes produced in
    DIFFERENT micro-batches. Also pins edge semantics: empty sets emit
    no rows; a single-element set and duplicate elements are fine."""
    import pyspark.sql.functions as F

    from recipes_spark.operators.dedup import band_hashes

    rows = [
        (1, ["a", "b", "c", "d"]),
        (2, ["a", "b", "c", "d"]),      # identical set -> identical bhashes
        (3, []),                         # empty -> excluded
        (4, ["z"]),                      # singleton
        (5, ["a", "a", "a"]),            # duplicates
        (6, list("the quick brown fox jumps".split())),
    ]
    df = spark.createDataFrame(rows, "doc_id long, s array<string>")

    def collect_bands(d):
        out = band_hashes(d, id_col="doc_id", set_col="s",
                          num_hashes=32, bands=8)
        return sorted((r["doc_id"], r["bhash"]) for r in out.collect())

    one = collect_bands(df.coalesce(1))
    many = collect_bands(df.repartition(5, "doc_id"))
    assert one == many

    ids = {i for i, _ in one}
    assert 3 not in ids
    assert {1, 2, 4, 5, 6} <= ids
    b1 = sorted(h for i, h in one if i == 1)
    b2 = sorted(h for i, h in one if i == 2)
    assert b1 == b2 and len(b1) == 8


def test_banding_and_bloom_exclude_null_inputs(spark):
    """NULL set columns (null text upstream) and NULL bloom keys are
    EXCLUDED, not crashes: the kernel treats a NULL array like an empty
    one, and bloom build/probe filter null keys (they test negative by
    definition — their positions were never set)."""
    from recipes_spark.operators.dedup import (
        band_hashes,
        bloom_build,
        bloom_members,
    )

    df = spark.createDataFrame(
        [(1, ["a", "b", "c", "d"]), (2, None), (3, ["x", "y", "z", "w"])],
        "doc_id long, s array<string>",
    )
    out = band_hashes(df, id_col="doc_id", set_col="s", num_hashes=16, bands=4)
    assert {r["doc_id"] for r in out.collect()} == {1, 3}

    kdf = spark.createDataFrame(
        [(1, "aa"), (2, None), (3, "bb")], "id long, t string"
    )
    bm = bloom_build(kdf, "t", m_bits=1024, k=2)
    mem = bloom_members(kdf, "t", bm, m_bits=1024, k=2)
    assert {r["id"] for r in mem.collect()} == {1, 3}


def test_band_rows_matches_per_row_reference(spark):
    """The vectorized kernel (flat concat + minimum.reduceat + reshape)
    must equal a straightforward per-row reference: same splitmix64
    lane permutation and band fold computed one document at a time in
    plain Python over the SAME xxhash64 base values. Catches
    segmentation/reshape/ordering bugs independent of any downstream
    query."""
    import numpy as np
    import pyspark.sql.functions as F

    from recipes_spark.operators.dedup import _splitmix64, band_hashes

    num_hashes, bands = 32, 8
    r = num_hashes // bands
    rows = [
        (1, ["alpha", "beta", "gamma"]),
        (2, ["delta"]),
        (3, ["alpha", "alpha", "zeta", "eta", "theta", "iota", "kappa"]),
        (4, ["x%d" % i for i in range(50)]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, s array<string>")

    # independent reference: per row, per lane, plain min over mixed values
    base = {
        row["doc_id"]: row["hs"]
        for row in df.select(
            "doc_id", F.transform("s", lambda x: F.xxhash64(x)).alias("hs")
        ).collect()
    }
    lane_keys = _splitmix64(
        np.arange(1, num_hashes + 1, dtype=np.uint64)
        * np.uint64(0x9E3779B97F4A7C15)
    )
    band_keys = _splitmix64(lane_keys ^ np.uint64(0xA5A5A5A55A5A5A5A))
    expected = set()
    for did, hs in base.items():
        hv = np.array(hs, dtype=np.int64).view(np.uint64)
        mixed = [
            _splitmix64(
                np.array([_splitmix64(hv ^ lane_keys[lane]).min()])
                ^ band_keys[lane]
            )[0]
            for lane in range(num_hashes)
        ]
        for b in range(bands):
            acc = np.bitwise_xor.reduce(
                np.array(mixed[b * r : (b + 1) * r], dtype=np.uint64)
            )
            expected.add((did, int(np.uint64(acc).astype(np.int64))))

    got = {
        (row["doc_id"], row["bhash"])
        for row in band_hashes(
            df, id_col="doc_id", set_col="s", num_hashes=num_hashes, bands=bands
        ).collect()
    }
    assert got == expected


def test_cms_overestimate_bound_and_merge(spark, sf_dir):
    """The count-min contracts that make the sketch usable at scale:
    (1) estimates NEVER undercount (hard guarantee — every occurrence
    increments all its buckets); (2) overcount stays within the
    ~e/width · N collision bound; (3) per-shard sketches merged by
    summing counters EQUAL the whole-corpus sketch (sum-mergeability —
    the property that lets 100 TB keep per-day sketches)."""
    import math

    import pyspark.sql.functions as F

    from recipes_spark.io import load
    from recipes_spark.operators.sketches import (
        cms_counters,
        cms_estimate,
        cms_merge,
    )

    depth, width = 4, 1024
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    tc = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .cache()
    )
    counters = cms_counters(tc, depth=depth, width=width)
    exact = {r["term"]: r["cnt"] for r in tc.collect()}
    n_total = sum(exact.values())
    probes = tc.select("term")
    est = {
        r["term"]: r["est"]
        for r in cms_estimate(probes, counters, depth=depth, width=width).collect()
    }
    bound = math.e / width * n_total
    assert set(est) == set(exact)
    for t, e in est.items():
        assert e >= exact[t], f"CMS undercounted {t!r}: {e} < {exact[t]}"
        assert e <= exact[t] + 2 * bound, (
            f"CMS overcount for {t!r} beyond 2x the e/w*N bound: "
            f"{e} vs exact {exact[t]} + {2 * bound:.1f}"
        )

    # Shard mergeability: counters(half A) + counters(half B) == counters(all).
    def half_counts(pred):
        return (
            d.filter(pred)
            .select(F.explode(F.split("text", " ")).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )

    a = cms_counters(half_counts(F.col("doc_id") % 2 == 0), depth=depth, width=width)
    b = cms_counters(half_counts(F.col("doc_id") % 2 == 1), depth=depth, width=width)
    merged = {
        (r["dep"], r["b"]): r["c"] for r in cms_merge(a, b).collect()
    }
    whole = {(r["dep"], r["b"]): r["c"] for r in counters.collect()}
    tc.unpersist()
    assert merged == whole


def test_cms_never_undercounts_under_heavy_collision(spark):
    """The never-undercount guarantee must hold at an operating point
    the corpus test can't reach: width=4, depth=2 over 64 distinct
    terms forces ~16 terms per bucket, so every estimate is heavily
    collision-inflated — and still none may fall below its true count
    (min over depths can only pick a counter that CONTAINS the term's
    own increments). Also pins the out-of-corpus probe path: absent
    terms may overestimate (collisions) but a term whose every bucket
    is untouched estimates exactly 0."""
    import pyspark.sql.functions as F

    from recipes_spark.operators.sketches import cms_counters, cms_estimate

    depth, width = 2, 4
    terms = spark.range(640).select(
        F.concat(F.lit("t"), (F.col("id") % 64).cast("string")).alias("term")
    )
    tc = terms.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    exact = {r["term"]: r["cnt"] for r in tc.collect()}
    counters = cms_counters(tc, depth=depth, width=width)
    est = {
        r["term"]: r["est"]
        for r in cms_estimate(
            tc.select("term"), counters, depth=depth, width=width
        ).collect()
    }
    assert set(est) == set(exact)
    for t, e in est.items():
        assert e >= exact[t], f"undercount for {t}: {e} < {exact[t]}"


def test_portable_hash_three_way_agreement(spark):
    """The portable sha256-slice hash underpins every bit-exact sketch
    oracle (bloom positions, CMS buckets, epoch shuffle, temperature
    sampling): pin all THREE implementations against each other on
    adversarial keys — Spark's conv(substring(sha2)), DuckDB's
    CAST('0x'||substr(sha256)), and Python's hashlib — including
    unicode, empties-adjacent, long keys, and digest prefixes that
    start with 0 (where a naive parse could drop leading zeros)."""
    import hashlib

    import duckdb
    import pyspark.sql.functions as F

    keys = (
        ["", " ", "a", "0", "00000000"]
        + ["日本語テキスト", "mixed 语言 текст", "emoji 🚀 key"]
        + [f"key-{i}" * (i % 7 + 1) for i in range(50)]
    )
    mod = 4096

    def py_bucket(k: str, d: int) -> int:
        h = hashlib.sha256(f"{d}:{k}".encode()).hexdigest()
        return int(h[:8], 16) % mod

    expected = {(k, d): py_bucket(k, d) for k in keys for d in range(4)}

    sdf = spark.createDataFrame([(k,) for k in keys], "k string")
    cols = [
        (
            F.conv(
                F.substring(
                    F.sha2(F.concat(F.lit(f"{d}:"), F.col("k")), 256), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % mod
        ).alias(f"b{d}")
        for d in range(4)
    ]
    spark_got = {
        (r["k"], d): r[f"b{d}"]
        for r in sdf.select("k", *cols).collect()
        for d in range(4)
    }
    assert spark_got == expected

    con = duckdb.connect()
    duck_got = {}
    for k in keys:
        for d in range(4):
            (b,) = con.execute(
                "SELECT CAST('0x' || substr(sha256(? || ':' || ?), 1, 8) "
                f"AS BIGINT) % {mod}",
                [str(d), k],
            ).fetchone()
            duck_got[(k, d)] = b
    assert duck_got == expected


def test_leakage_safe_split_contract(spark, sf_dir):
    """The split-scheme audit must show the structural property, not
    just match the oracle: cluster-level assignment has ZERO cross-
    split near-dup pairs by construction (both endpoints share the
    component hash), while row-level assignment leaks some — the
    silent eval-contamination a naive split ships. Also: every doc is
    in exactly one split under both schemes."""
    from recipes_spark.io import load
    from recipes_spark.registry import all_queries

    rows = {
        r["scheme"]: r.asDict()
        for r in all_queries()["x6_leakage_safe_split"](spark, sf_dir).collect()
    }
    n_docs = load(spark, sf_dir, "documents").count()
    for scheme, r in rows.items():
        assert r["n_train"] + r["n_val"] + r["n_test"] == n_docs, scheme
    assert rows["cluster"]["leaked_pairs"] == 0
    assert rows["row"]["leaked_pairs"] > 0


def test_simhash_recall_on_planted_neardups(spark, sf_dir):
    """x2_simhash's quality gate (since round 12 the sketch is the
    portable 60-bit sha-slice family and the query is fully oracled;
    this test guards the RECALL contract the value-hash can't — the
    oracle replays the same banding, so it would match even if recall
    collapsed). Banded candidate
    generation over 4 bands is pigeonhole-COMPLETE only to hamming <=
    bands-1 = 3 (4+ flips can land one in every band), so the gate
    asserts exactly the operator's contract: (1) every planted pair
    whose sketch distance is <= 3 MUST be emitted (guaranteed tier);
    (2) overall planted recall at hamming <= 8 stays >= 0.8
    (probabilistic tier — measured 0.9 here, one hamming-4 pair
    spreads its flips across all bands); (3) every EMITTED pair's
    sketch distance honors the claimed max_hamming bound."""
    import pyspark.sql.functions as F

    from recipes_spark.io import load
    from recipes_spark.operators.dedup import simhash_pairs, simhash_sketch

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    # Deterministic planted set: LIMIT without ORDER BY is
    # re-evaluation-dependent, and this plan executes in several
    # separate jobs (corpus build, pairs, sketches) — collect the ids
    # ONCE and drive every downstream set from that list.
    planted_ids = [
        r["doc_id"]
        for r in d.filter(F.size(F.split("text", " ")) >= 50)
        .orderBy("doc_id")
        .limit(10)
        .collect()
    ]
    long_docs = d.filter(F.col("doc_id").isin(planted_ids))
    planted = long_docs.select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.concat("text", F.lit(" perturbation")).alias("text"),
    )
    corpus = d.unionByName(planted)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(
            corpus, "doc_id", "text", max_hamming=8, bands=4
        ).collect()
    }
    sk = {
        r["doc_id"]: r["sketch"]
        for r in simhash_sketch(corpus, id_col="doc_id", text_col="text").collect()
    }
    expected = {
        (i, i + 5_000_000) for i in planted_ids
    }

    def ham(a, b):
        return bin(sk[a] ^ sk[b]).count("1")

    guaranteed = {(a, b) for a, b in expected if ham(a, b) <= 3}
    missed_guaranteed = guaranteed - pairs
    assert not missed_guaranteed, (
        f"pairs within the pigeonhole guarantee missed: {missed_guaranteed}"
    )
    recall = len(expected & pairs) / len(expected)
    assert recall >= 0.8, f"planted recall {recall:.2f} < 0.8"
    for a, b in pairs:
        assert ham(a, b) <= 8, (a, b, ham(a, b))


def test_approx_distinct_tracks_exact(spark, oracle_sf_dir):
    """agg_approx_distinct's quality gate (rows-only — HLL++ estimates
    are implementation-specific): every per-group estimate within 6%
    of the exact distinct count (rsd=0.02 requested; 6% = 3 sigma)."""
    import pyspark.sql.functions as F

    from recipes_spark.io import load
    from recipes_spark.registry import all_queries

    est = {
        r["l_returnflag"]: r["approx_orders"]
        for r in all_queries()["agg_approx_distinct"](
            spark, oracle_sf_dir
        ).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in load(spark, oracle_sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for flag, e in est.items():
        rel = abs(e - exact[flag]) / exact[flag]
        assert rel <= 0.06, (flag, e, exact[flag])


def test_jsonl_ingest_quarantines_corrupt_lines(spark, tmp_path):
    """Malformed lines in crawled JSONL (truncated writes, encoding
    damage, junk) must quarantine, not vanish silently or fail the
    read: PERMISSIVE mode + columnNameOfCorruptRecord gives the same
    P3 semantics as the granule codec — valid rows intact, corrupt
    lines countable/routable. The assert on BOTH counts pins that the
    corrupt rows are visible (silent nulling would pass a naive
    valid-rows-only check)."""
    import pyspark.sql.functions as F

    path = tmp_path / "shard.jsonl"
    lines = [
        '{"doc_id": 1, "text": "ok one"}',
        '{"doc_id": 2, "text": "ok two"}',
        '{"doc_id": 3, "text": "truncated',  # cut mid-string
        "not json at all",
        '{"doc_id": 4, "text": "ok three"}',
    ]
    path.write_text("\n".join(lines))
    df = (
        spark.read.schema(
            "doc_id BIGINT, text STRING, _corrupt_record STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(path))
        .cache()
    )
    valid = df.filter(F.col("_corrupt_record").isNull())
    corrupt = df.filter(F.col("_corrupt_record").isNotNull())
    assert sorted(r["doc_id"] for r in valid.collect()) == [1, 2, 4]
    assert corrupt.count() == 2
    # The quarantined payloads carry the original line for triage.
    payloads = {r["_corrupt_record"] for r in corrupt.collect()}
    assert any("truncated" in p for p in payloads)
    df.unpersist()
