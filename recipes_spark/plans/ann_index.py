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


def _books_df(
    spark: SparkSession, coarse: np.ndarray, books: np.ndarray
) -> DataFrame:
    """Model rows: (part, j, c, d, val) — part 0 = the (n_centroids ×
    dim) coarse book keyed (c=cid, d=dim, j=0), part 1 = the
    (m × k_codes × sub) PQ books keyed (j, c, d). All int64 milli."""
    rows = [
        (0, 0, int(c), int(d), int(coarse[c, d]))
        for c in range(coarse.shape[0])
        for d in range(coarse.shape[1])
    ] + [
        (1, int(j), int(c), int(d), int(books[j, c, d]))
        for j in range(books.shape[0])
        for c in range(books.shape[1])
        for d in range(books.shape[2])
    ]
    return spark.createDataFrame(
        rows, "part int, j int, c long, d int, val long"
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
    the warehouse way)."""
    from recipes_spark.operators.similarity import pq_encode_int

    if version == 1:
        snapshot_commit(
            spark,
            _books_df(spark, coarse, books),
            os.path.join(store, "books"),
            1,
        )
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
    (m, k_codes, sub)) int64 — a model-sized collect through the v1
    books manifest, the read-side twin of _books_df."""
    rows = snapshot_read(spark, os.path.join(store, "books"), 1).collect()
    co = [(int(r["c"]), int(r["d"]), int(r["val"]))
          for r in rows if r["part"] == 0]
    pq = [(int(r["j"]), int(r["c"]), int(r["d"]), int(r["val"]))
          for r in rows if r["part"] == 1]
    kc = max(c for c, _, _ in co) + 1
    dim = max(d for _, d, _ in co) + 1
    coarse = np.zeros((kc, dim), dtype=np.int64)
    for c, d, v in co:
        coarse[c, d] = v
    m = max(j for j, _, _, _ in pq) + 1
    kk = max(c for _, c, _, _ in pq) + 1
    sub = max(d for _, _, d, _ in pq) + 1
    books = np.zeros((m, kk, sub), dtype=np.int64)
    for j, c, d, v in pq:
        books[j, c, d] = v
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
    code_bits: int = 8,
    attrs: DataFrame | None = None,
) -> None:
    """Grow the index WITHOUT retraining (faiss add(): new vectors
    encode against the COMMITTED books) — loads the v1 model from the
    store, encodes only `new_vectors`, and commits them as an APPEND
    snapshot: version N's manifest = version N−1's files plus the
    delta files, so untouched cells get no new bytes and a reader at
    N−1 never sees the delta. ``attrs`` carries the delta rows'
    denormalized metadata, matching the columns committed at v1 (an
    attrs-carrying index must append attrs-carrying deltas; version
    mixes still read via the merged schema — see ann_index_codes)."""
    coarse, books = ann_index_load_books(spark, store)
    ann_index_commit(
        spark, new_vectors, store, version, coarse, books,
        id_col=id_col, vec_col=vec_col, code_bits=code_bits,
        attrs=attrs,
    )
