"""S5/S6 listing, S9 YAML reader, S10/S11 granule metadata extraction
(SURVEY.md §5.2 items 1 and 3)."""

from __future__ import annotations

import os
import tempfile

from recipes_spark.sources.granules import (
    file_metadata,
    granule_meta,
    stage_granules,
)
from recipes_spark.sources.listing import cached_glob, glob_listing


def test_glob_listing_sorted_per_pattern(spark, sf_dir):
    df = glob_listing(spark, [f"{sf_dir}/*.parquet"])
    urls = [r.url for r in df.collect()]
    assert urls == sorted(urls)
    assert any(u.endswith("lineitem.parquet") for u in urls)


def test_cached_glob_materializes_and_hits(spark, sf_dir):
    cache_root = tempfile.mkdtemp(prefix="recipes_test_cache_")
    pattern = f"{sf_dir}/*.parquet"
    first = cached_glob(spark, pattern, cache_root=cache_root)
    n = first.count()
    manifests = os.listdir(cache_root)
    assert len(manifests) == 1 and manifests[0].endswith(".parquet")
    # Hit path returns identical rows even if the dir changed since.
    hit = cached_glob(spark, pattern, cache_root=cache_root)
    assert hit.count() == n
    assert [r.url for r in hit.collect()] == [r.url for r in first.collect()]
    # cache=False bypasses the manifest.
    live = cached_glob(spark, pattern, cache_root=cache_root, cache=False)
    assert live.count() == n


def test_manifest_keys_ignore_ineffective_blacklist(spark):
    """Keys shift only for blacklist stamps that actually REMOVED a grid
    row: off-grid, out-of-range, and duplicate entries are no-ops for
    the anti-join and must be no-ops for the arithmetic key too
    (FilePattern.items() list-position parity)."""
    from recipes_spark.sources.timegrid import manifest

    def keys(blacklist):
        m = manifest(
            spark, "2024-01-01 00:00:00", "2024-01-01 00:12:00",
            root="http://x", blacklist=blacklist,
        )
        return [r.key for r in m.orderBy("ts").collect()]

    # Off-grid + out-of-range entries remove nothing: keys stay 0..4.
    assert keys(["2024-01-01 00:01:00", "2023-12-31 23:57:00"]) == [0, 1, 2, 3, 4]
    # A duplicated on-grid entry counts once, not twice.
    assert keys(["2024-01-01 00:03:00", "2024-01-01 00:03:00"]) == [0, 1, 2, 3]
    # Baseline: one effective on-grid drop.
    assert keys(["2024-01-01 00:03:00"]) == [0, 1, 2, 3]


def test_granule_roundtrip(spark):
    root = stage_granules(8)
    meta = file_metadata(spark, os.path.join(root, "*.nc"))
    rows = {r.granule_id: r for r in meta.collect()}
    assert len(rows) == 8
    expect = granule_meta(3)
    got = rows["granule_0003"]
    assert got.platform == "METOP_B"
    assert got.west == expect["west"] and got.north == expect["north"]
    assert got.n_bytes > 100  # header + payload
    assert got.end_datetime > got.start_datetime


def test_undecodable_files_dropped(spark):
    root = tempfile.mkdtemp(prefix="recipes_test_badfiles_")
    with open(os.path.join(root, "junk.nc"), "wb") as fh:
        fh.write(b"this is not a granule")
    meta = file_metadata(spark, os.path.join(root, "*.nc"))
    assert meta.count() == 0
