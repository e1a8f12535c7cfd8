"""THE portable cross-engine hash: sha256-hex-slice → integer bucket.

`sha_slice_bucket(col, m)` = int(sha256_hex(col)[0:8], 16) % m — the
one construction that evaluates byte-identically in Spark
(`conv(substring(sha2(col, 256), 1, 8), 16, 10)`), DuckDB
(`CAST('0x' || substr(sha256(col), 1, 8) AS BIGINT)`), and Python
(`int(hashlib.sha256(x).hexdigest()[:8], 16)`), pinned three-way by
tests/test_corpus.py::test_portable_hash_three_way_agreement.
xxhash64/hash() are engine-specific; this is what every bit-exact
sketch/sampling oracle stands on (bloom positions, CMS buckets, epoch
shuffle, temperature sampling, split assignment).

ONE definition so a change (slice width, cast, modulus handling) can
never desynchronize one consumer from the others' DuckDB oracles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def sha_slice_bucket(col: Column | str, m: int) -> Column:
    """Bucket in [0, m) from the first 8 hex chars of sha256(col).
    `col` must already be a string column/expression (callers cast —
    the cast convention, e.g. CAST(x AS VARCHAR), is part of each
    oracle's contract)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.sha2(c, 256), 1, 8), 16, 10).cast("long") % m


def weighted_priority(id_col: Column | str, weight_col: Column | str) -> Column:
    """Hash-priority key for deterministic WEIGHTED sampling: the full
    32-bit sha-slice of the id divided (floor) by the row weight —
    double the weight, halve the priority, keep the k SMALLEST per
    stratum (the A-ES u^(1/w) idea in exact integer arithmetic).
    floor(double(h)/double(w)) equals integer division exactly here:
    h < 2^32, so any non-divisible quotient sits at least 1/h (>> one
    ulp) away from an integer boundary. DuckDB replay:
    CAST(('0x' || substr(sha256(CAST(id AS VARCHAR)), 1, 8)) AS BIGINT)
      // weight
    Shared by x6_weighted_sample and st18's streaming sample state so
    batch and stream can never disagree on a priority."""
    i = F.col(id_col) if isinstance(id_col, str) else id_col
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h = F.conv(F.substring(F.sha2(i.cast("string"), 256), 1, 8), 16, 10).cast(
        "long"
    )
    return F.floor(h / w).cast("long")
