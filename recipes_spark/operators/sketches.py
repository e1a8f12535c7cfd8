"""Count-min sketch (Cormode & Muthukrishnan 2005): mergeable frequency
counters for heavy-hitter queries over corpus-scale token streams.

The bloom filter (operators/dedup.py) answers membership with m bits of
OR-mergeable state; the CMS answers FREQUENCY with depth×width
SUM-mergeable counters — together they are the two sketch families a
100 TB ingest keeps per shard instead of exact indexes. Estimates never
undercount (every true occurrence increments all its buckets) and
overcount by at most ~e/width · N with high probability; min-over-depth
is what shrinks collisions' inflation.

Bit positions use the same portable sha256-slice construction as the
bloom filter (`_bloom_positions`): bucket_d = int(hex(sha256(f"{d}:{t}"))
[0:8], 16) % width — byte-identical to DuckDB's CAST('0x' ||
substr(sha256(...), 1, 8) AS BIGINT) % width, so counter tables and
estimates are exactly replayable in SQL and the driver oracle is
bit-for-bit, not statistical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _cms_bucket(term_col: str | Column, d: int, width: int) -> Column:
    """Portable bucket for hash row `d` — the shared sha256-slice
    construction (functions/portable_hash.py) with the depth index
    baked into the hashed string so the d rows are independent hash
    functions."""
    from recipes_spark.functions.portable_hash import sha_slice_bucket

    c = F.col(term_col) if isinstance(term_col, str) else term_col
    return sha_slice_bucket(F.concat(F.lit(f"{d}:"), c), width)


def cms_counters(
    weighted_terms: DataFrame,
    *,
    term_col: str = "term",
    count_col: str = "cnt",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the sketch as a DataFrame[dep int, b long, c long] of
    depth×width counters from (term, count) rows.

    Scale shape: the input is already the per-term aggregate (one
    map-side-combinable hash agg — the only corpus-sized shuffle); the
    counter build explodes each term to `depth` rows and aggregates to
    AT MOST depth·width rows — fixed-size state regardless of corpus,
    which is the whole point. Shard merge = unionByName + groupBy sum
    (counters are sums — see cms_merge), so a 100 TB pipeline keeps
    per-shard/day sketches and answers global frequency queries by
    merging kilobytes."""
    rows = weighted_terms.select(
        F.col(count_col).alias("__cnt"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("dep"),
                        _cms_bucket(term_col, d, width).alias("b"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__db"),
    )
    return (
        rows.select("__db.dep", "__db.b", "__cnt")
        .groupBy("dep", "b")
        .agg(F.sum("__cnt").cast("long").alias("c"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge shard sketches: counter tables are sum-mergeable by
    construction (each is a sum over its shard's occurrences), so the
    merged sketch EQUALS the sketch of the concatenated corpus —
    property-tested in tests/test_corpus.py."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("dep", "b").agg(F.sum("c").cast("long").alias("c"))


def cms_estimate(
    probes: DataFrame,
    counters: DataFrame,
    *,
    term_col: str = "term",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimate each probe term's corpus frequency: min over the depth
    counters it hashes into. Returns DataFrame[term, est long].

    The probe side is queries (small); the counter side is ≤depth·width
    rows → broadcast — estimation is a broadcast join, it never touches
    the corpus. A probe term's bucket that no corpus term mapped to has
    NO counter row; that absence means counter value 0 (so the min —
    the estimate — is 0): left join + coalesce, or a term unseen by the
    sketch would take its min over only the collision-inflated buckets
    and report a phantom frequency. Corpus-member probes always hit all
    `depth` rows (their own counts are in every bucket), so this only
    shows with out-of-corpus probes — the streaming prior-batch probe
    (st14) hits it on every first occurrence."""
    pb = probes.select(
        F.col(term_col).alias("term"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("dep"),
                        _cms_bucket(term_col, d, width).alias("b"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__db"),
    ).select("term", "__db.dep", "__db.b")
    return (
        pb.join(F.broadcast(counters), ["dep", "b"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("c", F.lit(0))).cast("long").alias("est"))
    )
