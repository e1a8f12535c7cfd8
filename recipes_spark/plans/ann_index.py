"""Persisted ANN index lifecycle: train once, COMMIT as a versioned
artifact, serve many, append incrementally (r14 verdict tasks 1–2).

At 100 TB an ANN index is not a query-local temporary — it is built
once (the expensive distributed coarse train + one fused encode pass),
committed like a training-data release, and then served by thousands
of search queries and GROWN by delta batches without retraining. This
module composes the existing pieces:

- the snapshot store (plans/catalog.py snapshot_commit/snapshot_read —
  manifest-pinned versioned parquet, the same machinery behind the
  x6_release family), holding TWO substores per index:
    <store>/books : the model — coarse centroids + PQ subspace books
                    as (part, j, c, d, val) rows (part 0 = coarse,
                    part 1 = PQ). Committed once at v1; the books are
                    immutable for the index's lifetime (delta batches
                    encode against them — faiss's add-after-train
                    contract).
    <store>/codes : the data — (id, codes_packed, cell) per vector,
                    hive-partitioned by cell so a probed search reads
                    only probed partitions. Versioned: v2+ are APPEND
                    commits holding only delta rows.
- pq_encode_int (operators/similarity.py) for the fused cell+code
  encode, and ivf_pq_search_coded for serving — the identical search
  plan whether codes are fresh or manifest-read.

Reference shape: faiss IVFPQ's train() / add() / search() lifecycle
(public API), re-expressed as versioned parquet snapshots + DataFrame
plans so every stage is driver-verifiable.
"""

from __future__ import annotations

import os

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from recipes_spark.plans.catalog import snapshot_commit, snapshot_read


#: Ordered scalar metadata persisted with the model (part 2 of the
#: books substore): the commit-time encoding parameters a later append
#: or serve session MUST reuse — re-supplying a different code_bits
#: would pack v2 codes with a different bit layout than v1 with no
#: error anywhere downstream (r15 ADVICE).
_META_KEYS = ("code_bits", "m", "k_codes", "n_centroids", "dim")


def _books_df(
    spark: SparkSession,
    coarse: np.ndarray,
    books: np.ndarray,
    code_bits: int,
) -> DataFrame:
    """Model rows: (part, j, c, d, val) — part 0 = the (n_centroids ×
    dim) coarse book keyed (c=cid, d=dim, j=0), part 1 = the
    (m × k_codes × sub) PQ books keyed (j, c, d), part 2 = the scalar
    commit parameters keyed j=index-into-_META_KEYS. All int64."""
    meta_vals = (
        code_bits, books.shape[0], books.shape[1],
        coarse.shape[0], coarse.shape[1],
    )
    rows = (
        [
            (0, 0, int(c), int(d), int(coarse[c, d]))
            for c in range(coarse.shape[0])
            for d in range(coarse.shape[1])
        ]
        + [
            (1, int(j), int(c), int(d), int(books[j, c, d]))
            for j in range(books.shape[0])
            for c in range(books.shape[1])
            for d in range(books.shape[2])
        ]
        + [(2, i, 0, 0, int(v)) for i, v in enumerate(meta_vals)]
    )
    return spark.createDataFrame(
        rows, "part int, j int, c long, d int, val long"
    )


def _books_pdf(spark: SparkSession, store: str):
    """ONE read of the v1 books substore as pandas — the shared
    manifest collect + Arrow transfer behind ann_index_load_books and
    ann_index_meta. The r16 lifecycle chains read the books store
    twice per append/upsert (matrices, then meta — two manifest
    collects + two model scans of the same immutable v1 snapshot);
    every internal consumer now derives both from this single read."""
    return snapshot_read(spark, os.path.join(store, "books"), 1).toPandas()


def _meta_from_pdf(pdf) -> dict[str, int]:
    part2 = pdf[pdf["part"] == 2]
    return {
        _META_KEYS[int(j)]: int(v)
        for j, v in zip(part2["j"], part2["val"])
    }


def ann_index_meta(spark: SparkSession, store: str) -> dict[str, int]:
    """The committed encoding parameters (part-2 rows of the v1 books
    substore) as {key: value}. Empty dict for a pre-meta store (the
    caller's values then stand unvalidated, the r15 behavior)."""
    return _meta_from_pdf(_books_pdf(spark, store))


def _validate_meta(
    meta: dict[str, int],
    coarse: np.ndarray,
    books: np.ndarray,
    code_bits: int,
) -> None:
    """A later commit/append against an existing store must carry the
    COMMIT-TIME parameters — loudly, not via silent code corruption."""
    if not meta:
        return
    got = {
        "code_bits": code_bits,
        "m": books.shape[0],
        "k_codes": books.shape[1],
        "n_centroids": coarse.shape[0],
        "dim": coarse.shape[1],
    }
    bad = {
        k: (meta[k], got[k]) for k in meta if k in got and meta[k] != got[k]
    }
    if bad:
        raise ValueError(
            "ann_index: supplied encoding parameters differ from the "
            f"committed store's (stored, supplied): {bad} — appends and "
            "serves must reuse the commit-time values"
        )


def ann_index_commit(
    spark: SparkSession,
    corpus: DataFrame,
    store: str,
    version: int,
    coarse: np.ndarray,
    books: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_bits: int = 8,
    coded: DataFrame | None = None,
    attrs: DataFrame | None = None,
    meta: dict[str, int] | None = None,
) -> None:
    """Commit index `version`: encode `corpus` against the books (ONE
    fused pq_encode_int pass — cell id + packed codes) and
    snapshot-commit the codes hive-partitioned by cell; at v1 also
    commit the books substore. The cell rides twice (partition key +
    data column) because snapshot_read's leaf-file scan does not
    re-infer partition directories (snapshot_commit's documented
    contract). ``coded`` supplies an already-encoded
    (id, codes_packed, __list) DataFrame (e.g. a checkpointed one
    also feeding a plan-side manifest) instead of re-encoding.

    ``attrs`` (an (id_col, metadata…) DataFrame) denormalizes
    filterable metadata INTO the codes rows at COMMIT time — one join
    per index build, so a filtered search pays a pushed parquet
    predicate on the codes scan instead of a corpus-sized join per
    query (the faiss-IDSelector / vector-DB metadata-filter shape done
    the warehouse way).

    ``meta`` passes the COMMITTED encoding parameters a caller already
    read (append/upsert load the books store anyway, r17) so a v2+
    commit validates against them without re-reading the books
    snapshot — the validation itself is unchanged."""
    from recipes_spark.operators.similarity import pq_encode_int

    if version == 1:
        snapshot_commit(
            spark,
            _books_df(spark, coarse, books, code_bits),
            os.path.join(store, "books"),
            1,
        )
    else:
        if meta is None:
            meta = ann_index_meta(spark, store)
        _validate_meta(meta, coarse, books, code_bits)
    if coded is None:
        coded = pq_encode_int(
            corpus, books, id_col=id_col, vec_col=vec_col,
            coarse_milli=coarse, code_bits=code_bits,
        )
    rows = coded.select(
        id_col,
        "codes_packed",
        F.col("__list").cast("int").alias("cell"),
        F.col("__list").cast("int").alias("cell_key"),
    )
    if attrs is not None:
        # LEFT join: a vector with no attrs row must still be IN the
        # index (searchable unfiltered, null metadata) — an inner join
        # would silently drop it from every search, not just filtered
        # ones.
        rows = rows.join(attrs, id_col, "left")
    snapshot_commit(
        spark,
        rows.repartition("cell_key"),
        os.path.join(store, "codes"),
        version,
        partition_by=("cell_key",),
    )


def ann_index_load_books(
    spark: SparkSession, store: str
) -> tuple[np.ndarray, np.ndarray]:
    """Load the committed model back: (coarse (k, dim), books
    (m, k_codes, sub)) int64 — a model-sized Arrow collect through the
    v1 books manifest, the read-side twin of _books_df. The matrix
    rebuild is vectorized numpy fancy-index scatter (r15 verdict
    housekeeping): at the k=4096 × dim=512 production point the old
    per-row Python loop was ~2M iterations per serve session."""
    return _matrices_from_pdf(_books_pdf(spark, store))


def _matrices_from_pdf(pdf) -> tuple[np.ndarray, np.ndarray]:
    part = pdf["part"].to_numpy(dtype=np.int64)
    j = pdf["j"].to_numpy(dtype=np.int64)
    c = pdf["c"].to_numpy(dtype=np.int64)
    d = pdf["d"].to_numpy(dtype=np.int64)
    val = pdf["val"].to_numpy(dtype=np.int64)
    co = part == 0
    coarse = np.zeros((int(c[co].max()) + 1, int(d[co].max()) + 1), np.int64)
    coarse[c[co], d[co]] = val[co]
    pq = part == 1
    books = np.zeros(
        (int(j[pq].max()) + 1, int(c[pq].max()) + 1, int(d[pq].max()) + 1),
        np.int64,
    )
    books[j[pq], c[pq], d[pq]] = val[pq]
    return coarse, books


def ann_index_codes(
    spark: SparkSession, store: str, version: int, *,
    id_col: str = "vec_id",
    extra: tuple[str, ...] = (),
) -> DataFrame:
    """The committed codes visible at `version`, through its manifest
    only — (id_col, codes_packed, __list[, extra…]),
    ivf_pq_search_coded's input shape. ``extra`` exposes metadata
    columns the commit denormalized in (see ann_index_commit attrs) —
    a filter on them pushes into the parquet scan. The read always
    merges file schemas (snapshot_read merge_schema): an index whose
    later versions gained attr columns must read older files as NULL
    attrs, not silently drop the column."""
    return snapshot_read(
        spark, os.path.join(store, "codes"), version, merge_schema=True
    ).select(
        id_col, "codes_packed", F.col("cell").alias("__list"), *extra
    )


def ann_index_append(
    spark: SparkSession,
    new_vectors: DataFrame,
    store: str,
    version: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_bits: int | None = None,
    attrs: DataFrame | None = None,
) -> None:
    """Grow the index WITHOUT retraining (faiss add(): new vectors
    encode against the COMMITTED books) — loads the v1 model from the
    store, encodes only `new_vectors`, and commits them as an APPEND
    snapshot: version N's manifest = version N−1's files plus the
    delta files, so untouched cells get no new bytes and a reader at
    N−1 never sees the delta. ``code_bits`` defaults to the COMMITTED
    value (the part-2 meta rows); supplying one that differs from the
    store's fails loudly in ann_index_commit — a mismatched width
    would pack delta codes with a different bit layout than v1.
    ``attrs`` carries the delta rows' denormalized metadata, matching
    the columns committed at v1 (an attrs-carrying index must append
    attrs-carrying deltas; version mixes still read via the merged
    schema — see ann_index_codes).

    The books snapshot is read ONCE per append (r17): matrices and
    meta both derive from the same pdf, and the commit's v2+
    validation reuses that meta instead of a third read — the r16
    chain paid three manifest collects + model scans of the same
    immutable v1 snapshot per append."""
    pdf = _books_pdf(spark, store)
    coarse, books = _matrices_from_pdf(pdf)
    meta = _meta_from_pdf(pdf)
    if code_bits is None:
        code_bits = meta.get("code_bits", 8)
    ann_index_commit(
        spark, new_vectors, store, version, coarse, books,
        id_col=id_col, vec_col=vec_col, code_bits=code_bits,
        attrs=attrs, meta=meta,
    )


def ann_index_tombstones_commit(
    spark: SparkSession,
    store: str,
    version: int,
    tombstones: DataFrame,
    *,
    id_col: str = "vec_id",
) -> None:
    """MERGE-ON-READ deletion, the write half (Iceberg positional
    deletes / Delta deletion vectors, applied to the ANN index): a
    delete request commits the tombstoned ids as a TINY versioned
    sidecar substore (``<store>/tombs``) instead of rewriting any
    codes file — bytes ∝ tombstones, the cheapest possible delete.
    Serves subtract it via ann_index_codes_live until a maintenance
    window folds it physically (ann_index_fold_tombstones). Sidecar
    versions are cumulative via the snapshot machinery's append
    lineage: commit version N's df as the NEW requests; a reader at
    N sees all requests ≤ N."""
    snapshot_commit(
        spark,
        tombstones.select(id_col),
        os.path.join(store, "tombs"),
        version,
    )


def ann_index_tombstones(
    spark: SparkSession, store: str, version: int, *,
    id_col: str = "vec_id",
) -> DataFrame:
    """The tombstone ids visible at sidecar `version` (cumulative —
    the manifest union of every request ≤ version)."""
    return snapshot_read(
        spark, os.path.join(store, "tombs"), version
    ).select(id_col)


def ann_index_codes_live(
    spark: SparkSession,
    store: str,
    codes_version: int,
    tombs_version: int | None,
    *,
    id_col: str = "vec_id",
    extra: tuple[str, ...] = (),
) -> DataFrame:
    """The LIVE index view under merge-on-read deletion: the committed
    codes at ``codes_version`` minus the sidecar at ``tombs_version``
    (None = no pending deletes). The subtraction is a broadcast
    anti-join on the id-list-sized sidecar that composes into the
    identical ivf_pq_search_coded plan — the deletion-vector mask done
    the join way. After a fold, pass the new codes version and None."""
    codes = ann_index_codes(
        spark, store, codes_version, id_col=id_col, extra=extra
    )
    if tombs_version is None:
        return codes
    return codes.join(
        F.broadcast(ann_index_tombstones(
            spark, store, tombs_version, id_col=id_col
        )),
        id_col,
        "left_anti",
    )


def ann_index_fold_tombstones(
    spark: SparkSession,
    store: str,
    version: int,
    tombs_version: int,
    *,
    id_col: str = "vec_id",
) -> list[int]:
    """The maintenance-window FOLD: apply the sidecar physically as a
    partial-rewrite commit (ann_index_delete driven by the committed
    tombstones), batching every delete request ≤ ``tombs_version``
    into one touched-cell rewrite — the lakehouse deletion-vector
    compaction cadence. Returns the touched cell ids. The sidecar
    stays readable for audit until vacuumed."""
    return ann_index_delete(
        spark, store, version,
        ann_index_tombstones(spark, store, tombs_version, id_col=id_col),
        id_col=id_col,
    )


def ann_index_upsert(
    spark: SparkSession,
    changed: DataFrame,
    store: str,
    version: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coded: DataFrame | None = None,
    attrs: DataFrame | None = None,
) -> list[int]:
    """UPSERT re-ingested vectors — the reference's pgstac sink
    semantics (re-runs REPLACE rows, `avhrr…/recipe.py:85,137`)
    applied to the index, completing mutability: commit/append/delete
    handle add and remove; this handles CHANGE (a document re-embeds
    after an edit, its id keeps serving the NEW vector). One commit
    does both halves: the cells holding the ids' OLD rows rewrite
    minus them (the delete shape — drop_where per touched cell), and
    the NEW encodes (against the committed books, the append shape)
    land as fresh files in whatever cells they now belong to — same
    cell or different, old codes are provably gone and new codes
    provably present in one snapshot. ``coded`` passes an
    already-encoded (id, codes_packed, __list) plan (the commit-side
    convention); ``attrs`` carries the new rows' denormalized
    metadata. Returns the rewritten (old-side) cell ids.

    100 TB: cost = old-side touched cells' rows + one delta encode —
    the delete and append economics added together (SCALE.md
    index_delete_economics / index_lifecycle_10x), never a full
    rebuild."""
    from recipes_spark.operators.similarity import pq_encode_int

    # One books read for matrices + meta (see ann_index_append, r17).
    bpdf = _books_pdf(spark, store)
    coarse, books = _matrices_from_pdf(bpdf)
    code_bits = _meta_from_pdf(bpdf).get("code_bits", 8)
    codes_store = os.path.join(store, "codes")
    prev = snapshot_read(spark, codes_store, version - 1, merge_schema=True)
    ids = changed.select(id_col)
    touched_old = sorted(
        int(r["cell"])
        for r in prev.join(ids, id_col).select("cell").distinct().collect()
    )
    if coded is None:
        coded = pq_encode_int(
            changed, books, id_col=id_col, vec_col=vec_col,
            coarse_milli=coarse, code_bits=code_bits,
        )
    new_rows = coded.select(
        id_col,
        "codes_packed",
        F.col("__list").cast("int").alias("cell"),
        F.col("__list").cast("int").alias("cell_key"),
    )
    if attrs is not None:
        new_rows = new_rows.join(attrs, id_col, "left")
    if touched_old:
        keep = (
            prev.filter(F.col("cell").isin(*touched_old))
            .join(ids, id_col, "left_anti")
            .withColumn("cell_key", F.col("cell").cast("int"))
        )
        df = keep.unionByName(new_rows, allowMissingColumns=True)
        drop = " OR ".join(
            f"file LIKE '%/cell_key={c}/%'" for c in touched_old
        )
    else:
        # pure insert: degenerates to the append shape
        df = new_rows
        drop = None
    snapshot_commit(
        spark,
        df.repartition("cell_key"),
        codes_store,
        version,
        partition_by=("cell_key",),
        drop_where=drop,
    )
    return touched_old


def ann_index_delete(
    spark: SparkSession,
    store: str,
    version: int,
    tombstones: DataFrame,
    *,
    id_col: str = "vec_id",
) -> list[int]:
    """REMOVE vectors from the committed index (faiss remove_ids, done
    the table-format way — r15 verdict task 1): a cleaning/dedup pass
    that drops documents must drop their vectors too. Implemented as a
    PARTIAL-REWRITE commit per touched cell: the cells containing any
    tombstoned id are rewritten minus those rows (every column —
    codes AND denormalized attrs — rides through), while untouched
    cells carry over BY REFERENCE in the new manifest (zero new
    bytes, byte-identical files). The dropped cell files remain owned
    by the prior manifests until snapshot_vacuum expires them, so
    time travel across the delete still works and a fenced history is
    one vacuum away. Returns the touched cell ids (bounded by
    n_centroids — the same class of driver collect as a partition
    listing).

    100 TB: cost ∝ the touched cells' row count (one pruned scan +
    one partitioned write), never the index size; the untouched-cell
    proof is a manifest string compare."""
    codes_store = os.path.join(store, "codes")
    prev = snapshot_read(spark, codes_store, version - 1, merge_schema=True)
    tomb = tombstones.select(id_col)
    touched = sorted(
        int(r["cell"])
        for r in prev.join(tomb, id_col).select("cell").distinct().collect()
    )
    if not touched:
        # Nothing to delete: the commit degrades to "manifest = prior
        # version's files" (the empty-delta convention).
        remaining = prev.filter(F.lit(False))
        drop = None
    else:
        remaining = prev.filter(
            F.col("cell").isin(*touched)
        ).join(tomb, id_col, "left_anti")
        # The trailing slash pins the full partition-directory name:
        # cell_key=3/ must not match cell_key=33/.
        drop = " OR ".join(
            f"file LIKE '%/cell_key={c}/%'" for c in touched
        )
    snapshot_commit(
        spark,
        remaining.withColumn(
            "cell_key", F.col("cell").cast("int")
        ).repartition("cell_key"),
        codes_store,
        version,
        partition_by=("cell_key",),
        drop_where=drop,
    )
    return touched
