"""Plan-fingerprint lockfile: hashes of the NORMALIZED physical plans
of the bench headline queries.

Why: per-query wall time on a shared host swings 2× (SCALE.md), so a
time diff is a weak regression signal — but a PHYSICAL PLAN change
(a broadcast that became a shuffle, a pushed filter that stopped
pushing, an extra exchange) is deterministic and is what actually
predicts the 100 TB behavior. The lockfile pins the plan; any commit
that changes a headline plan fails the suite until the fingerprint is
regenerated DELIBERATELY:

    python tools/plan_fingerprints.py      # regenerate the lockfile

Normalization strips the run-varying parts of the plan string (expr
ids, plan ids, lambda variable counters, file listings, statistics)
— stability across fresh sessions is itself asserted by the test.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys
from contextlib import contextmanager

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOCKFILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "plan_fingerprints.json")
SF_DIR = "/root/testdata/sf0.1"


def normalize_plan(plan: str) -> str:
    p = re.sub(r"#\d+[L]?", "#N", plan)              # expression ids
    p = re.sub(r"plan_id=\d+", "plan_id=N", p)
    # Session-global lambda variable counters: element vars print as
    # `lambda x_<n>`, index vars (index-aware filter/transform) as
    # `lambda y_<n>` — normalize ANY single-letter lambda name, keeping
    # the letter (arity/role) and masking the counter.
    p = re.sub(r"lambda ([a-z])_\d+", r"lambda \1_K", p)
    # With-CSE aliases (count_if rewrites etc.) number from a
    # session-global counter, like the lambda variables above.
    p = re.sub(r"_common_expr_\d+", "_common_expr_K", p)
    p = re.sub(r"InMemoryFileIndex\([^)]*\)\[[^\]]*\]", "FILES", p)
    p = re.sub(r"file:[^,\s\]]+", "PATH", p)
    p = re.sub(r"Statistics\([^)]*\)", "STATS", p)
    p = re.sub(r"\(\d+ paths?\)", "(paths)", p)
    # Partition COUNTS are environment (spark.sql.shuffle.partitions /
    # core count), not plan shape — the lock must hold under any
    # SPARK_GRAFT_CPUS. Keep the partitioning KEYS, mask the counts.
    p = re.sub(r"(hashpartitioning\([^()]*), \d+\)", r"\1, P)", p)
    p = re.sub(r"(rangepartitioning\([^()]*), \d+\)", r"\1, P)", p)
    p = re.sub(r"RoundRobinPartitioning\(\d+\)", "RoundRobinPartitioning(P)", p)
    p = re.sub(r"coalesced from \d+", "coalesced from P", p)
    p = re.sub(r"splits=\d+", "splits=P", p)  # Range default parallelism
    return p


def plan_hash(df) -> str:
    # Capture UNTRUNCATED: Spark elides long field lists with '…' at
    # maxToStringFields, and the cut position shifts with expr-id digit
    # widths (session-dependent) — content lost to truncation cannot be
    # normalized back. Raise the limit for the capture, restore after.
    conf = df.sparkSession.conf
    prev_fields = conf.get("spark.sql.debug.maxToStringFields", "25")
    prev_meta = conf.get("spark.sql.maxMetadataStringLength", "100")
    try:
        conf.set("spark.sql.debug.maxToStringFields", "10000")
        # Scan-node metadata (DataFilters/ReadSchema lists) abbreviates
        # at maxMetadataStringLength CHARS — the cut lands mid-token at
        # a position that shifts with expr-id digit widths. 10M, not
        # 100k: the round-12 bloom-gated decontamination scan carries a
        # ~40 KB pushed-filter literal (2048 int64 bloom words), which
        # blew past the old limit and made the cut session-dependent
        # again (caught by the full suite, invisible standalone).
        conf.set("spark.sql.maxMetadataStringLength", "10000000")
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        conf.set("spark.sql.debug.maxToStringFields", prev_fields)
        conf.set("spark.sql.maxMetadataStringLength", prev_meta)
    return hashlib.sha256(normalize_plan(plan).encode()).hexdigest()[:12]


@contextmanager
def capture_pre_checkpoint():
    """Capture hook closing the lock's CHECKPOINT BLIND SPOT (round-12
    verdict): `localCheckpoint` truncates lineage, so any stage behind
    one is invisible in the checkpointed query's executed plan — the
    round-12 xxhash64→sha2 banding swap changed x2_minhash_lsh's hot
    stage without moving its fingerprint. While active, every
    DataFrame passed to localCheckpoint is captured BEFORE truncation;
    the caller fingerprints those pre-checkpoint plans as first-class
    lockfile entries (`<name>#pre_ckpt<i>`, construction order).

    The patch targets the CLASSIC DataFrame class, not the abstract
    base `pyspark.sql.DataFrame`: in PySpark 4 the classic subclass
    defines its own localCheckpoint, so a base-class patch is never
    dispatched (verified — it captured nothing)."""
    from pyspark.sql.classic.dataframe import DataFrame as _DF

    captured: list = []
    orig = _DF.localCheckpoint

    def patched(self, *args, **kwargs):
        # Forward verbatim: PySpark 4's signature is (eager=True,
        # storageLevel=None) and callers may pass either positionally —
        # a pinned (self, eager) shim would TypeError under the lock
        # tool only (ADVICE r13).
        captured.append(self)
        return orig(self, *args, **kwargs)

    _DF.localCheckpoint = patched
    try:
        yield captured
    finally:
        _DF.localCheckpoint = orig


def hash_with_pre_checkpoints(name: str, build, out: dict[str, str]) -> None:
    """Fingerprint `build()`'s plan under `name`, plus every plan its
    construction passed to localCheckpoint as `name#pre_ckpt<i>`."""
    with capture_pre_checkpoint() as caps:
        df = build()
    out[name] = plan_hash(df)
    for i, pre in enumerate(caps):
        out[f"{name}#pre_ckpt{i}"] = plan_hash(pre)


def extra_plans(spark) -> dict[str, str]:
    """Non-headline plans worth pinning:

    - join_bucketed — the zero-exchange bucketed fact-fact join
      (SURVEY §4.2): a shuffle Exchange appearing on either join side
      is exactly the regression this lock exists to catch.
    - st2_batch_side / st14_batch_side — the streaming queries' OWN
      harness plans embed run-local temp paths, but their batch-side
      transformations are ordinary DataFrames (streaming/queries.py
      tumbling_agg; streaming/ingest.py st14_term_counts +
      st14_hot_terms, the exact functions the foreachBatch body calls)
      applied here to batch inputs — so a broadcast-gone-shuffle or an
      un-pruned scan in the streamed plan fails the suite too.
    - join_interval_overlap — the bucketed interval join must stay a
      PARTITIONED equi-join on the bucket key: losing the equi
      component (e.g. the join condition collapsing into a pure
      filter) degrades it to the O(n·m) nested-loop it exists to
      avoid.
    - join_asof_nearest — the one-shuffle claim: both direction fills
      share a single hashpartitioning(user_id) exchange; a second
      exchange or a join appearing in this plan is the regression.
    - st17_batch_side — st17's foreachBatch transformations
      (st17_value_hist + st17_prior_quantiles) on batch inputs, the
      same pinning the other sketch-state streams get.
    - event_pattern_match — the one-exchange claim: both stacked
      running-max windows and the final agg cluster on user_id; a
      second hashpartitioning appearing here means the funnel pass
      regressed to multi-shuffle.
    - g7_points_in_polygons — the tiled spatial join: the containment
      filter must stay AFTER a (tx, ty)-keyed join (broadcast at this
      SF); a CartesianProduct or a filter-only plan is the quadratic
      regression the tiling exists to avoid.
    - agg_bootstrap_ci — the 32x replicate explode must flow into ONE
      map-side-combining hash agg keyed (event_type, b); an extra
      exchange before the agg would shuffle the exploded stream.
    - st18/st19/st21 batch-sides + event_attribution_lasttouch (st23's
      batch twin) — the round-7 sketch-state streams' foreachBatch
      bodies call these exact transformations; pinning them on batch
      inputs locks the streamed plans the same way st2/st14/st17 are
      locked (st20's twin event_pattern_match and st22's window_cusum
      are pinned above already).
    """
    import pyspark.sql.functions as F

    from recipes_spark.io import load
    from recipes_spark.operators.sketches import cms_counters
    from recipes_spark.registry import all_queries
    from recipes_spark.streaming.ingest import st14_hot_terms, st14_term_counts
    from recipes_spark.streaming.queries import tumbling_agg

    out = {}
    q = all_queries()
    hash_with_pre_checkpoints(
        "join_bucketed", lambda: q["join_bucketed"](spark, SF_DIR), out
    )
    ev = load(spark, SF_DIR, "events")
    out["st2_batch_side"] = plan_hash(tumbling_agg(ev))
    tc = st14_term_counts(
        load(spark, SF_DIR, "documents").select("doc_id", "text")
    )
    prior = cms_counters(tc, depth=4, width=1024)
    out["st14_batch_side"] = plan_hash(
        st14_hot_terms(tc, prior, 1, depth=4, width=1024, thresh=200)
    )
    hash_with_pre_checkpoints(
        "join_interval_overlap",
        lambda: q["join_interval_overlap"](spark, SF_DIR),
        out,
    )
    hash_with_pre_checkpoints(
        "join_asof_nearest", lambda: q["join_asof_nearest"](spark, SF_DIR), out
    )
    from recipes_spark.streaming.ingest import (
        st17_prior_quantiles,
        st17_value_hist,
    )

    hist = st17_value_hist(ev.select("event_id", "value"))
    out["st17_batch_side"] = plan_hash(st17_prior_quantiles(hist, 1))
    from recipes_spark.streaming.ingest import (
        _chain_edges,
        st18_batch_candidates,
        st21_batch_moments,
    )

    docs = load(spark, SF_DIR, "documents")
    out["st18_batch_side"] = plan_hash(
        st18_batch_candidates(docs.select("source", "doc_id", "n_chars"))
    )
    out["st19_batch_side"] = plan_hash(
        _chain_edges(docs.select(F.col("doc_id").alias("node")))
    )
    out["st21_batch_side"] = plan_hash(st21_batch_moments(ev))
    from recipes_spark.streaming.ingest import st24_batch_registers

    out["st24_batch_side"] = plan_hash(
        st24_batch_registers(docs.select("doc_id", "text"))
    )
    hash_with_pre_checkpoints(
        "event_attribution_lasttouch",
        lambda: q["event_attribution_lasttouch"](spark, SF_DIR),
        out,
    )
    for name in (
        "event_pattern_match",
        "g7_points_in_polygons",
        "agg_bootstrap_ci",
        # window_cusum: grid join + two stacked windows + filter must
        # stay one event_type exchange; ts_linear_interp: same chained
        # rule for grid + both IGNORE-NULLS windows; x4_source_gini:
        # rank window and sum agg share the source exchange.
        "window_cusum",
        "ts_linear_interp",
        "x4_source_gini",
        # window_twap (st25's batch twin) + agg_spearman: the round-9
        # hot-key reshapes — the range shuffle + shard-local window +
        # seam stitch must not silently regress to a per-event_type
        # global sort (the lead/rank windows' partition specs are also
        # asserted structurally in test_plans.py; this pins the whole
        # plan).
        "window_twap",
        "agg_spearman",
        # Round-9 second wave: OHLC must stay ONE hash aggregate with
        # no window node (it doubles as st26's batch side);
        # stac_search_intersects must keep the envelope conjunct that
        # makes the exact polygon test pushdown-friendly; line dedup's
        # reassembly must stay a doc-keyed agg, never a global sort.
        "window_ohlc",
        "stac_search_intersects",
        "x4_line_dedup",
        # Round-10: the last two full-vocab rank windows now heap-select
        # top-k BEFORE ranking — a Window re-appearing below the
        # TakeOrderedAndProject is the single-task funnel regression
        # (also asserted structurally in test_plans.py).
        "x4_zipf_fit",
        "x4_vocab_coverage_curve",
        # Round-11: both BPE encode paths must stay zero-shuffle
        # single-island plans (an exchange/join appearing in either is
        # the regression); the substring-dedup and decontamination
        # anchor joins must keep their hashed-gram shapes; the
        # classifier and the stratified sample are row-local +
        # broadcast plans that must not grow a corpus-keyed exchange.
        # (x6_corpus_pipeline_e2e / x4_dsir_weights localCheckpoint at
        # construction — their post-checkpoint plans scan run-local
        # RDDs, so they are pinned structurally in test_plans.py
        # instead.)
        "x4_bpe_apply",
        "x4_bpe_apply_greedy",
        "x2_substring_dedup",
        "x4_decontaminate_spans",
        "x4_lang_macro_f1",
        "x4_quality_classifier",
        "x6_stratified_hash_sample",
    ):
        hash_with_pre_checkpoints(
            name, lambda n=name: q[n](spark, SF_DIR), out
        )
    return out


def current_fingerprints(spark) -> dict[str, str]:
    from bench import HEADLINE
    from recipes_spark.registry import all_queries

    q = all_queries()
    out = {}
    for name in HEADLINE:
        if name.startswith("st") or name == "t4_session_window":
            # Streaming-harness queries EXECUTE at construction and
            # their plans include run-local temp paths in source nodes
            # — their batch-side twins are pinned via extra_plans.
            continue
        # Pre-checkpoint stages are fingerprinted too: a headline
        # query's checkpointed stage (minhash banding) is otherwise
        # invisible to the lock (the round-12 blind spot).
        hash_with_pre_checkpoints(
            name, lambda n=name: q[n](spark, SF_DIR), out
        )
    out.update(extra_plans(spark))
    return out


if __name__ == "__main__":
    from recipes_spark.session import get_session

    spark = get_session("plan-fingerprints", cpus="8")
    with open(LOCKFILE, "w") as fh:
        json.dump(current_fingerprints(spark), fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {LOCKFILE}")
