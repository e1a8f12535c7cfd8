"""Intent-level tests for the round-7 second-wave operators on PLANTED
inputs (see test_intent_round7.py for the rationale: the oracle gate
cannot catch BOTH engines encoding the same wrong specification, so
each operator's defining behavior is asserted on hand-built cases
where the intended and the plausible-but-wrong semantics diverge)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import Row

from recipes_spark.registry import all_queries

QUERIES = all_queries()

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mini_events(spark, tmp_path, rows):
    """Write a minimal events.parquet: rows = (event_id, minutes_after_T0,
    event_type)."""
    ev = spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=T0 + dt.timedelta(minutes=m),
                user_id=i,
                event_type=et,
                value=1.0,
                props="{}",
            )
            for i, m, et in rows
        ]
    )
    out = str(tmp_path)
    ev.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )
    return out


def test_overlap_duration_measures_contended_segments_only(spark, tmp_path):
    """Three planted 30-min error intervals: [0,30), [10,40), [60,90).
    Only 10:00-30:00 has two active -> exactly 20 minutes of overlap;
    the third interval, overlapping nothing, adds zero. The
    plausible-but-wrong sum-of-pairwise-overlaps happens to agree here,
    so plant a TRIPLE overlap too: three intervals [100,130), [101,131),
    [102,132) -> contended time is 102..131 \\ wait: >=2 active from 101
    to 132-? compute: active>=2 between 101 and 131 -> wrong if pairwise
    (which would double-count the triple region)."""
    rows = [
        (0, 0, "error"),
        (1, 10, "error"),
        (2, 60, "error"),
        # triple-overlap group, disjoint from the first (starts at 200)
        (3, 200, "error"),
        (4, 201, "error"),
        (5, 202, "error"),
    ]
    sf = _mini_events(spark, tmp_path, rows)
    out = {
        r["event_type"]: r["overlap_micros"]
        for r in QUERIES["event_overlap_duration"](spark, sf).collect()
    }
    # group 1: [0,30) and [10,40) overlap 20 min; [60,90) contributes 0.
    # group 2: active>=2 from 201 to 231 (when the 201 interval ends;
    # from 231 to 232 only the 202 interval remains) -> 30 min.
    # Pairwise double-counting would instead report 20 + (29+29+28) min.
    expected = (20 + 30) * 60 * 1_000_000
    assert out["error"] == expected


def test_interval_join_half_open_and_exactly_once(spark, tmp_path):
    """One error window [0,30). A purchase starting exactly at minute 30
    must NOT join (half-open); one starting at minute 20 must join
    EXACTLY ONCE even though both intervals replicate into two grid
    buckets (the responsibility filter, not dedup, enforces it)."""
    rows = [
        (0, 0, "error"),
        (1, 20, "purchase"),   # overlaps [0,30) by 10 min
        (2, 30, "purchase"),   # touches the boundary: NOT an overlap
        (3, 500, "purchase"),  # far away
    ]
    sf = _mini_events(spark, tmp_path, rows)
    out = QUERIES["join_interval_overlap"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["error_id"] == 0
    assert r["n_purchases"] == 1  # a bucket-replicated pair counted twice would read 2
    assert r["overlap_micros"] == 10 * 60 * 1_000_000


def test_histogram_quantile_interpolates_within_the_right_bucket(
    spark, tmp_path
):
    """200 planted prices for one flag: 100 rows at $1000 (bucket 0 of
    the $5000 grid) and 100 at $7000 (bucket 1). p50 needs rank 100 ->
    bucket 0, interpolated to its far edge: 0 + (100-0)*500000//100 =
    500000 cents. p90 needs rank 180 -> bucket 1: 500000 +
    (180-100)*500000//100 = 900000 cents. Off-by-one rank rules or
    interpolation against the wrong cumulative land elsewhere."""
    li = spark.createDataFrame(
        [Row(l_returnflag="A", l_extendedprice=1000.0)] * 100
        + [Row(l_returnflag="A", l_extendedprice=7000.0)] * 100
    )
    out_dir = str(tmp_path)
    li.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "lineitem.parquet")
    )
    rows = QUERIES["agg_histogram_quantile"](spark, out_dir).collect()
    assert len(rows) == 1
    assert rows[0]["p50_cents"] == 500_000
    assert rows[0]["p90_cents"] == 900_000


def test_histogram_quantile_within_one_bucket_of_exact(spark, sf_dir):
    """The sketch's accuracy CONTRACT: the histogram estimate and the
    true quantile live in the same $5000 bucket, so |est - exact| <
    500000 cents — checked against the exact percentile on the real
    fixture for both quantiles and every group."""
    import pyspark.sql.functions as F

    from recipes_spark.io import load

    est = {
        r["l_returnflag"]: r
        for r in QUERIES["agg_histogram_quantile"](spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.5, 0.9))"
            ).alias("p")
        )
        .collect()
    }
    for flag, row in est.items():
        for col, q in (("p50_cents", 0), ("p90_cents", 1)):
            true_cents = exact[flag]["p"][q] * 100
            assert abs(row[col] - true_cents) < 500_000, (flag, col)


def test_label_propagation_converges_per_triangle(spark):
    """Two disjoint triangles with id-seeded labels: mode propagation
    with the (count desc, label asc) tiebreak must converge each
    triangle to its minimum id and never leak a label across
    components."""
    import pyspark.sql.functions as F

    from recipes_spark.queries.dataops import label_propagation_rounds

    tri = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    e = spark.createDataFrame(tri, "u long, v long")
    und = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    labels = und.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    out = {
        r["node"]: r["label"]
        for r in label_propagation_rounds(und, labels, rounds=3).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10}


def test_weighted_sample_prefers_heavy_rows(spark, tmp_path):
    """One source, 8 docs: seven with weight 1 and one with weight 10^9.
    priority = hash div weight makes the heavy doc's priority < 5 while
    a weight-1 doc keeps its raw 32-bit hash (>= 5 with overwhelming,
    and here deterministic, margin) -> the heavy doc MUST be in the
    top-5. An unweighted (or inverted) rule would need hash luck."""
    docs = [
        Row(doc_id=i, text="t", lang="en", source="s0", n_chars=1)
        for i in range(7)
    ] + [Row(doc_id=99, text="t", lang="en", source="s0", n_chars=10**9)]
    out_dir = str(tmp_path)
    spark.createDataFrame(docs).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    rows = QUERIES["x6_weighted_sample"](spark, out_dir).collect()
    assert len(rows) == 5
    picked = {r["doc_id"] for r in rows}
    assert 99 in picked
    heavy = next(r for r in rows if r["doc_id"] == 99)
    assert heavy["priority"] < 5


def test_radius_search_thresholds_and_excludes_self(spark, tmp_path):
    """Query vec [1,0] (vec_id 0 < 5 makes it a query): a corpus vector
    at cosine 0.6 is in, one at 0.1 is out, and the query row itself —
    cosine 1.0 — must be excluded by the self-filter, not returned as
    its own best match."""
    import math

    def vec(sim):
        return [float(sim), math.sqrt(1.0 - sim * sim)]

    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0], label=0),
        Row(vec_id=10, embedding=vec(0.6), label=0),
        Row(vec_id=11, embedding=vec(0.1), label=0),
    ]
    out_dir = str(tmp_path)
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    out = QUERIES["x3_radius_search"](spark, out_dir).collect()
    assert [(r["query_id"], r["vec_id"]) for r in out] == [(0, 10)]
    assert abs(out[0]["cosine_sim"] - 0.6) < 1e-9


def test_st17_hist_state_retry_idempotent(spark, sf_dir, tmp_path):
    """st17 joins the st13/st14 batch-transactionality contract: after
    batches 0..2, redelivering batch 1 must leave emitted outputs and
    persisted histogram state byte-identical."""
    import pyspark.sql.functions as F

    from recipes_spark.io import load
    from recipes_spark.streaming.ingest import hist_probe_then_absorb

    ev = load(spark, sf_dir, "events").select("event_id", "value")
    batches = [
        ev.filter(F.pmod("event_id", F.lit(3)) == i) for i in range(3)
    ]
    out_dir = str(tmp_path / "out")
    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir, exist_ok=True)
    fn = hist_probe_then_absorb(spark, out_dir, state_dir)

    def snapshot():
        out = {}
        for bid in range(3):
            p = os.path.join(out_dir, f"batch={bid}")
            out[bid] = sorted(
                tuple(r) for r in spark.read.parquet(p).collect()
            )
        state = {
            name: sorted(
                tuple(r)
                for r in spark.read.parquet(
                    os.path.join(state_dir, name)
                ).collect()
            )
            for name in sorted(os.listdir(state_dir))
        }
        return out, state

    for bid, bdf in enumerate(batches):
        fn(bdf, bid)
    before = snapshot()
    fn(batches[1], 1)  # at-least-once redelivery
    assert snapshot() == before


def test_snapshot_isolation_and_retry(spark, tmp_path):
    """Three committed versions: every earlier version's read must be
    unaffected by later commits (manifest isolation), and re-committing
    a middle version (at-least-once retry) must leave all three reads
    identical."""
    from pyspark.sql import Row

    from recipes_spark.plans.catalog import snapshot_commit, snapshot_read

    store = str(tmp_path / "store")
    batches = {
        1: [Row(id=1, v="a"), Row(id=2, v="b")],
        2: [Row(id=3, v="c")],
        3: [Row(id=4, v="d"), Row(id=5, v="e")],
    }
    for ver, rows in batches.items():
        snapshot_commit(spark, spark.createDataFrame(rows), store, ver)

    def read(ver):
        return sorted(
            tuple(r) for r in snapshot_read(spark, store, ver).collect()
        )

    assert read(1) == [(1, "a"), (2, "b")]
    assert read(2) == [(1, "a"), (2, "b"), (3, "c")]
    assert read(3) == [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")]
    # Retry of the LATEST version is idempotent...
    snapshot_commit(spark, spark.createDataFrame(batches[3]), store, 3)
    assert read(1) == [(1, "a"), (2, "b")]
    assert read(2) == [(1, "a"), (2, "b"), (3, "c")]
    assert read(3) == [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")]
    # ...but a SUPERSEDED version's retry is rejected loudly: its
    # overwrite would delete part files v3's manifest references by
    # name, silently corrupting the later snapshot.
    import pytest

    with pytest.raises(ValueError, match="superseded"):
        snapshot_commit(spark, spark.createDataFrame(batches[2]), store, 2)
    assert read(3) == [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")]


def test_interleave_schedule_fairness(spark, sf_dir):
    """The weighted-fair schedule's defining properties on the real
    fixture: quotas are proportional-with-floor, heavier sources never
    starve, and there is no long same-source run (the failure mode of
    naive concatenation that the interleave exists to prevent)."""
    from recipes_spark.registry import all_queries

    rows = all_queries()["x6_interleave_schedule"](spark, sf_dir).collect()
    order = [r["source"] for r in sorted(rows, key=lambda r: r["position"])]
    assert len(set(order)) > 1
    # Longest same-source run: near-equal weights must interleave
    # tightly — a run of 3+ means the virtual-time keys are wrong.
    longest = cur = 1
    for a, b in zip(order, order[1:]):
        cur = cur + 1 if a == b else 1
        longest = max(longest, cur)
    assert longest <= 2
    # Every source's k sequence is gapless from 0 (no starved slots).
    from collections import defaultdict

    ks = defaultdict(list)
    for r in rows:
        ks[r["source"]].append(r["k"])
    for src, seq in ks.items():
        assert sorted(seq) == list(range(len(seq))), src


def test_st19_label_state_retry_idempotent(spark, sf_dir, tmp_path):
    """st19's running labeling: redelivering batch 1 after batches 0..2
    must leave every emitted labeling and every persisted label table
    byte-identical (it reads only batch 0's table and overwrites its
    own)."""
    import pyspark.sql.functions as F

    from recipes_spark.io import load
    from recipes_spark.streaming.ingest import cc_merge_then_emit

    d = load(spark, sf_dir, "documents").select("doc_id")
    n = d.count()
    chunk = -(-n // 3)
    batches = [
        d.filter(
            (F.col("doc_id") >= i * chunk)
            & (F.col("doc_id") < (i + 1) * chunk)
        )
        for i in range(3)
    ]
    out_dir = str(tmp_path / "out")
    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir, exist_ok=True)
    fn = cc_merge_then_emit(spark, out_dir, state_dir)

    def snapshot():
        out = {
            bid: sorted(
                tuple(r)
                for r in spark.read.parquet(
                    os.path.join(out_dir, f"batch={bid}")
                ).collect()
            )
            for bid in range(3)
        }
        state = {
            name: sorted(
                tuple(r)
                for r in spark.read.parquet(
                    os.path.join(state_dir, name)
                ).collect()
            )
            for name in sorted(os.listdir(state_dir))
        }
        return out, state

    for bid, bdf in enumerate(batches):
        fn(bdf, bid)
    before = snapshot()
    fn(batches[1], 1)
    assert snapshot() == before


def test_incremental_cc_equals_full_recompute(spark):
    """Confluence of seeded min propagation on a messier planted graph
    than the query's chains: two phases of nodes with cross-phase
    merge edges — CC seeded with phase 1's labels must equal a
    from-scratch CC over everything, including a component whose NEW
    minimum arrives in phase 2 (node 1 joins the 10-cluster), the case
    where stale seeds must be overwritten downward."""
    from recipes_spark.operators.dedup import connected_components

    old_edges = [(10, 11), (11, 12), (20, 21), (30, 31), (31, 32)]
    new_edges = [(12, 40), (41, 42), (1, 10)]  # merge + new + new-min
    all_nodes = sorted({n for e in old_edges + new_edges for n in e})
    old_nodes = sorted({n for e in old_edges for n in e})

    def df_nodes(ns):
        return spark.createDataFrame([(n,) for n in ns], "node long")

    def df_edges(es):
        return spark.createDataFrame(es, "src long, dst long")

    prior = connected_components(df_nodes(old_nodes), df_edges(old_edges))
    inc = connected_components(
        df_nodes(all_nodes),
        df_edges(old_edges + new_edges),
        initial_labels=prior,
    )
    full = connected_components(
        df_nodes(all_nodes), df_edges(old_edges + new_edges)
    )
    as_map = lambda df: {r["node"]: r["component"] for r in df.collect()}
    got, want = as_map(inc), as_map(full)
    assert got == want
    # The 1—10 edge must have pulled the whole old 10-cluster (and its
    # phase-2 extension through 40) down to the new minimum 1.
    for n in (1, 10, 11, 12, 40):
        assert got[n] == 1


def test_st18_sample_state_retry_idempotent(spark, sf_dir, tmp_path):
    """st18's running weighted sample: redelivering batch 1 after
    batches 0..2 must leave every emitted prefix sample and every
    persisted candidate table byte-identical."""
    import pyspark.sql.functions as F

    from recipes_spark.io import load
    from recipes_spark.streaming.ingest import sample_merge_then_emit

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    batches = [
        d.filter(F.pmod("doc_id", F.lit(3)) == i) for i in range(3)
    ]
    out_dir = str(tmp_path / "out")
    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir, exist_ok=True)
    fn = sample_merge_then_emit(spark, out_dir, state_dir)

    def snapshot():
        out = {
            bid: sorted(
                tuple(r)
                for r in spark.read.parquet(
                    os.path.join(out_dir, f"batch={bid}")
                ).collect()
            )
            for bid in range(3)
        }
        state = {
            name: sorted(
                tuple(r)
                for r in spark.read.parquet(
                    os.path.join(state_dir, name)
                ).collect()
            )
            for name in sorted(os.listdir(state_dir))
        }
        return out, state

    for bid, bdf in enumerate(batches):
        fn(bdf, bid)
    before = snapshot()
    fn(batches[1], 1)
    assert snapshot() == before
