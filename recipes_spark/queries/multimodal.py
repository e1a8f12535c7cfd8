"""X5 multimodal-column operators (SURVEY.md §2.12, north-star):
image/audio/video as opaque BINARY columns with typed metadata.

The real codecs (PIL/ffmpeg/torchaudio) are absent from this container,
so every decode is a clearly-marked deterministic fake derived from the
payload bytes — but the Spark-side machinery (binary columns, Arrow
batch shape, mapInPandas schemas, one-blob→many-rows expansion) is the
production path, and the fakes are pure byte arithmetic so DuckDB can
replay them: these stubs are oracle-VERIFIED plumbing, not dead code.

Scale notes: payloads stay in the executor (never collected); frame
expansion multiplies rows before the shuffle, so the frame stream
repartitions by (doc_id % N) buckets downstream if a groupBy follows;
binary batches keep Arrow batch size bounded via
spark.sql.execution.arrow.maxRecordsPerBatch when blobs are large.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from recipes_spark.io import load
from recipes_spark.registry import query


def decode_image_stub(payload: bytes) -> dict:
    """STUB for the image decode (PIL absent): deterministic fake
    dimensions/channel stats from the bytes. Replace the body with
    PIL.Image.open when the codec is available — the signature and the
    calling mapInPandas stay identical."""
    n = len(payload)
    return {
        "width": n % 640 + 1,
        "height": n % 480 + 1,
        "channels": 3,
        "mean_byte": float(sum(payload)) / n if n else 0.0,
    }


@query(
    "x5_image_features",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) % 640 + 1  AS width,
       octet_length(encode(text)) % 480 + 1  AS height,
       CAST(3 AS INT)                        AS channels,
       round((width * height) / 1000000.0, 4) AS megapixels
FROM documents
ORDER BY doc_id
""",
)
def x5_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5a: binary payload → image feature row via mapInPandas (decode
    stubbed; plumbing + arithmetic oracle-verified)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image_stub(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "channels": [f["channels"] for f in feats],
                    "megapixels": [
                        round(f["width"] * f["height"] / 1_000_000.0, 4)
                        for f in feats
                    ],
                }
            )

    return d.mapInPandas(
        extract,
        schema="doc_id long, width long, height long, channels int, "
        "megapixels double",
    ).orderBy("doc_id")


@query(
    "x5_resize_plan",
    oracle="""
WITH dims AS (
  SELECT doc_id,
         octet_length(encode(text)) % 640 + 1 AS width,
         octet_length(encode(text)) % 480 + 1 AS height
  FROM documents
)
SELECT doc_id, width, height,
       CAST(width * 256 // greatest(width, height) AS BIGINT)  AS out_width,
       CAST(height * 256 // greatest(width, height) AS BIGINT) AS out_height
FROM dims
ORDER BY doc_id
""",
)
def x5_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5b: aspect-preserving resize-to-256 geometry. The pixel
    resample is the stub; the geometry arithmetic (what a 100 TB
    pipeline plans batches around) is exact and oracle-checked —
    pure Catalyst, no UDF."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.octet_length(F.encode("text", "utf-8")).alias("n")
    )
    w = (F.col("n") % 640 + 1).cast("long")
    h = (F.col("n") % 480 + 1).cast("long")
    # Integer arithmetic, not float scale*dim: float rounds differently
    # across engines exactly at integer boundaries (256.0 vs 255.999…).
    dims = d.select("doc_id", w.alias("width"), h.alias("height"))
    return dims.selectExpr(
        "doc_id",
        "width",
        "height",
        "CAST((width * 256) DIV greatest(width, height) AS BIGINT) AS out_width",
        "CAST((height * 256) DIV greatest(width, height) AS BIGINT) AS out_height",
    ).orderBy("doc_id")


@query(
    "x5_frame_sample",
    oracle="""
WITH vids AS (
  SELECT doc_id, octet_length(encode(text)) % 120 + 1 AS n_frames
  FROM documents
)
SELECT doc_id, CAST(f.f AS INT) AS frame_idx,
       round(f.f / 24.0, 4) AS t_seconds
FROM vids, LATERAL (SELECT unnest(range(0, n_frames, 12)) AS f) f
ORDER BY doc_id, frame_idx
""",
)
def x5_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5c: video frame sampling — one blob → many frame rows (every
    12th frame of a fake 24 fps stream whose length derives from the
    payload). The UDTF-style expansion (§2.11) is sequence()+explode,
    JVM-side; the per-frame pixel decode would slot into a downstream
    mapInPandas."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        (F.octet_length(F.encode("text", "utf-8")) % 120 + 1).alias("n_frames"),
    )
    return (
        d.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(12))
            ).alias("frame_idx"),
        )
        .select(
            "doc_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.round(F.col("frame_idx") / 24.0, 4).alias("t_seconds"),
        )
        .orderBy("doc_id", "frame_idx")
    )


@query(
    "x5_audio_chunks",
    oracle="""
WITH clips AS (
  SELECT doc_id,
         octet_length(encode(text)) * 100 AS n_samples,
         md5(text)                        AS clip_digest
  FROM documents
)
SELECT doc_id, clip_digest,
       CAST(ceil(n_samples / 16000.0) AS BIGINT) AS n_chunks,
       round(n_samples / 16000.0, 4)             AS duration_sec
FROM clips
ORDER BY doc_id
""",
)
def x5_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5d: audio chunking plan — 16 kHz fake clips (100 samples per
    payload byte) split into 1-second windows; digest identifies the
    clip across the pipeline. All Catalyst (md5/ceil), no UDF."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        (F.octet_length(F.encode("text", "utf-8")) * 100).alias("n_samples"),
        F.md5(F.encode("text", "utf-8")).alias("clip_digest"),
    )
    return d.select(
        "doc_id",
        "clip_digest",
        F.ceil(F.col("n_samples") / 16000.0).cast("long").alias("n_chunks"),
        F.round(F.col("n_samples") / 16000.0, 4).alias("duration_sec"),
    ).orderBy("doc_id")


@query(
    "x5_real_format_headers",
    oracle="""
SELECT doc_id,
       CAST(doc_id % 640 + 1 AS BIGINT)        AS png_width,
       CAST(doc_id % 480 + 1 AS BIGINT)        AS png_height,
       CAST(8 AS INT)                          AS png_bit_depth,
       CAST(2 AS INT)                          AS png_color_type,
       CAST(doc_id % 2 + 1 AS INT)             AS wav_channels,
       CAST(8000 * (doc_id % 3 + 1) AS BIGINT) AS wav_sample_rate,
       CAST(((doc_id % 100 + 1) * 100 * 10000) // (8000 * (doc_id % 3 + 1))
            AS BIGINT)                         AS wav_duration_e4
FROM documents
ORDER BY doc_id
""",
)
def x5_real_format_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5e: REAL binary-format decoding, stdlib-only — unlike the
    byte-arithmetic stubs above, this builds VALID PNG and WAV payloads
    (signature + IHDR chunk; RIFF/fmt/data chunks) and then parses them
    back with struct.unpack exactly as a production header reader
    would: the parser sees only bytes, never doc_id. The oracle replays
    the GENERATOR arithmetic, so a value-hash match proves the parse
    round-trip. CRCs are not validated (header fixture carries no
    IDAT); swap PIL/soundfile in for pixel/sample decode with the same
    mapInPandas shape."""
    import struct

    d = load(spark, sf_dir, "documents").select("doc_id")

    def build_and_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def make_png(w: int, h: int) -> bytes:
            ihdr = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])
            return (
                b"\x89PNG\r\n\x1a\n"
                + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + b"\0\0\0\0"
            )

        def make_wav(channels: int, rate: int, n_samples: int) -> bytes:
            block_align = channels * 2
            data_size = n_samples * block_align
            fmt = struct.pack(
                "<HHIIHH", 1, channels, rate, rate * block_align, block_align, 16
            )
            return (
                b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
                + b"fmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", data_size)
            )

        def parse_png(b: bytes) -> tuple:
            assert b[:8] == b"\x89PNG\r\n\x1a\n", "bad PNG signature"
            (length,) = struct.unpack(">I", b[8:12])
            assert b[12:16] == b"IHDR" and length == 13
            w, h = struct.unpack(">II", b[16:24])
            depth, color = b[24], b[25]
            return w, h, depth, color

        def parse_wav(b: bytes) -> tuple:
            assert b[:4] == b"RIFF" and b[8:12] == b"WAVE", "bad RIFF"
            assert b[12:16] == b"fmt "
            _, channels, rate, _, block_align, _ = struct.unpack(
                "<HHIIHH", b[20:36]
            )
            assert b[36:40] == b"data"
            (data_size,) = struct.unpack("<I", b[40:44])
            return channels, rate, data_size // block_align

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                png = make_png(i % 640 + 1, i % 480 + 1)
                wav = make_wav(i % 2 + 1, 8000 * (i % 3 + 1), (i % 100 + 1) * 100)
                w, h, depth, color = parse_png(png)
                ch, rate, n_samples = parse_wav(wav)
                # Integer 1e-4-second units: float division + round()
                # is banker's-rounded in Python but half-away in SQL
                # engines — integer floor-div cannot diverge.
                rows.append(
                    (i, w, h, depth, color, ch, rate,
                     (n_samples * 10000) // rate)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "png_width", "png_height", "png_bit_depth",
                    "png_color_type", "wav_channels", "wav_sample_rate",
                    "wav_duration_e4",
                ],
            )

    return d.mapInPandas(
        build_and_parse,
        schema="doc_id long, png_width long, png_height long, "
        "png_bit_depth int, png_color_type int, wav_channels int, "
        "wav_sample_rate long, wav_duration_e4 long",
    ).orderBy("doc_id")


@query(
    "x5_phash_neardup",
    oracle="""
WITH hx AS (
  -- UTF-8 BYTES of the text, as hex pairs, truncated/space-padded to 64
  -- bytes — byte semantics identical to the engine's encode(text,'utf-8')
  -- path even for multi-byte characters (ascii()-per-character would
  -- diverge on any non-ASCII text).
  SELECT doc_id,
         rpad(substr(hex(encode(text)), 1, 128), 128, '20') AS h
  FROM documents
), px AS (
  SELECT doc_id,
         [(strpos('0123456789ABCDEF', substr(h, 2*i+1, 1)) - 1) * 16
          + strpos('0123456789ABCDEF', substr(h, 2*i+2, 1)) - 1
          FOR i IN range(0,64,1)] AS bytes
  FROM hx
), m AS (
  SELECT doc_id, bytes, list_sum(bytes)/64.0 AS mu FROM px
), bits AS (
  SELECT doc_id,
         [CASE WHEN bytes[i+1] > mu THEN 1 ELSE 0 END
          FOR i IN range(0,64,1)] AS bit
  FROM m
), bands AS (
  SELECT doc_id,
    list_sum([bit[j+1]    << j FOR j IN range(0,16,1)]) AS b0,
    list_sum([bit[16+j+1] << j FOR j IN range(0,16,1)]) AS b1,
    list_sum([bit[32+j+1] << j FOR j IN range(0,16,1)]) AS b2,
    list_sum([bit[48+j+1] << j FOR j IN range(0,16,1)]) AS b3
  FROM bits
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.b0,b.b0)::BIGINT) + bit_count(xor(a.b1,b.b1)::BIGINT) +
       bit_count(xor(a.b2,b.b2)::BIGINT) + bit_count(xor(a.b3,b.b3)::BIGINT)
         AS hamming
FROM bands a JOIN bands b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.b0,b.b0)::BIGINT) + bit_count(xor(a.b1,b.b1)::BIGINT) +
      bit_count(xor(a.b2,b.b2)::BIGINT) + bit_count(xor(a.b3,b.b3)::BIGINT) <= 3
""",
)
def x5_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: perceptual-hash near-duplicate pairs over the (stubbed)
    image payload — average-hash on the first 64 payload bytes (bit_i =
    byte_i > mean, the aHash recipe with the codec decode swapped for
    byte arithmetic), packed into 4 16-bit bands by one Arrow
    mapInPandas pass (numpy bit-packing per batch — the same stage a
    real decoder would occupy, and cheaper than a 64-wide Catalyst
    expression tree replicated across join branches). Candidates come
    from a band equi-join — hamming ≤ 3 over 4 bands guarantees ≥1
    identical band by pigeonhole, so banding is recall-COMPLETE, not
    heuristic — and the exact hamming verify runs on candidates only.
    The oracle checks the same result via an all-pairs join (tractable
    at oracle scale; the banded plan is the scale path)."""
    import numpy as np

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def hash_bands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.zeros((len(pdf), 64), dtype=np.int64)
            for i, payload in enumerate(pdf["payload"]):
                raw = bytes(payload)[:64]
                # rpad with spaces to 64 — mirrors the oracle exactly.
                raw = raw + b" " * (64 - len(raw))
                X[i] = np.frombuffer(raw, dtype=np.uint8)
            mu = X.mean(axis=1, keepdims=True)
            bits = (X > mu).astype(np.int64)
            weights = 1 << np.arange(16, dtype=np.int64)
            out = {"doc_id": pdf["doc_id"].to_numpy()}
            for k in range(4):
                out[f"b{k}"] = bits[:, 16 * k : 16 * (k + 1)] @ weights
            yield pd.DataFrame(out)

    bands = d.mapInPandas(
        hash_bands, "doc_id long, b0 long, b1 long, b2 long, b3 long"
    )
    lanes = bands.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"), F.col(f"b{k}").alias("v")
                    )
                    for k in range(4)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.k", "band.v")
    cand = (
        lanes.alias("a")
        .join(lanes.alias("b"), ["k", "v"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    a = bands.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(4)],
    )
    b = bands.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"b{k}").alias(f"bb{k}") for k in range(4)],
    )
    ham = None
    for k in range(4):
        t = F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"bb{k}")))
        ham = t if ham is None else ham + t
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .filter(ham <= 3)
        .select("id_a", "id_b", ham.cast("long").alias("hamming"))
    )


@query(
    "x5_jpeg_headers",
    oracle="""
SELECT doc_id,
       CAST(doc_id % 1920 + 1 AS BIGINT) AS jpg_width,
       CAST(doc_id % 1080 + 1 AS BIGINT) AS jpg_height,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS INT) AS jpg_ncomp,
       CAST(doc_id % 3 + 2 AS INT) AS jpg_nsegments
FROM documents
ORDER BY doc_id
""",
)
def x5_jpeg_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5f: REAL JPEG structure parsing, stdlib-only — the harder
    sibling of the PNG/WAV fixture: JPEG headers are NOT at fixed
    offsets, so the parser performs the genuine marker WALK (0xFF
    marker, big-endian segment length, skip, repeat) over a VALID
    stream (SOI → APP0/JFIF → a doc-dependent number of COM segments →
    SOF0 → EOI). The variable COM padding is the point: dimensions land
    at a different byte offset per document, so only a correct walk —
    not offset arithmetic — recovers them. The oracle replays the
    generator arithmetic; a value-hash match proves the walk. Same
    mapInPandas shape a production image-metadata pass uses (swap PIL
    in for pixel decode)."""
    import struct

    d = load(spark, sf_dir, "documents").select("doc_id")

    def build_and_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def make_jpeg(w: int, h: int, ncomp: int, ncom: int) -> bytes:
            out = b"\xff\xd8"  # SOI
            jfif = (
                b"JFIF\x00\x01\x01\x00"
                + struct.pack(">HH", 72, 72)
                + b"\x00\x00"
            )
            out += b"\xff\xe0" + struct.pack(">H", 2 + len(jfif)) + jfif
            for i in range(ncom):
                comment = f"pad segment {i}".encode()
                out += b"\xff\xfe" + struct.pack(">H", 2 + len(comment)) + comment
            comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(ncomp))
            sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp]) + comps
            out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
            return out + b"\xff\xd9"  # EOI

        def parse_jpeg(b: bytes) -> tuple:
            assert b[:2] == b"\xff\xd8", "bad SOI"
            i, nseg = 2, 0
            w = h = ncomp = None
            while i < len(b):
                assert b[i] == 0xFF, f"lost sync at {i}"
                marker = b[i + 1]
                if marker == 0xD9:  # EOI
                    break
                (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
                nseg += 1
                if marker == 0xC0:  # SOF0: precision, height, width, ncomp
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    ncomp = b[i + 9]
                i += 2 + seglen
            assert w is not None, "no SOF0 found"
            return w, h, ncomp, nseg

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                jpg = make_jpeg(
                    i % 1920 + 1, i % 1080 + 1, 3 if i % 2 == 0 else 1, i % 3
                )
                w, h, ncomp, nseg = parse_jpeg(jpg)
                rows.append((i, w, h, ncomp, nseg))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "jpg_width", "jpg_height", "jpg_ncomp",
                    "jpg_nsegments",
                ],
            )

    return d.mapInPandas(
        build_and_parse,
        schema="doc_id long, jpg_width long, jpg_height long, "
        "jpg_ncomp int, jpg_nsegments int",
    ).orderBy("doc_id")


@query(
    "x5_scene_cuts",
    oracle="""
WITH vids AS (
  SELECT doc_id, octet_length(encode(text)) % 120 + 1 AS n_frames
  FROM documents
), frames AS (
  SELECT doc_id, CAST(f.f AS BIGINT) AS frame_idx,
         (doc_id * 7 + (f.f // 36) * 83) % 200 + f.f % 3 AS luma
  FROM vids, LATERAL (SELECT unnest(range(0, n_frames, 12)) AS f) f
), d AS (
  SELECT doc_id, frame_idx, luma,
         abs(luma - lag(luma) OVER (PARTITION BY doc_id
                                    ORDER BY frame_idx)) AS delta
  FROM frames
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(count_if(delta >= 16) AS BIGINT) AS n_cuts,
       CAST(min(CASE WHEN delta >= 16 THEN frame_idx END) AS BIGINT)
         AS first_cut_idx
FROM d GROUP BY doc_id ORDER BY doc_id
""",
)
def x5_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: SCENE-CUT detection over the sampled frame stream — the
    temporal composition on top of x5_frame_sample's expansion: a
    deterministic per-frame luma stands in for the decoded-pixel
    statistic (scene id = frame div 36, so the signal is
    piecewise-constant with in-scene jitter), consecutive SAMPLED
    frames difference via lag, and a jump >= 16 marks a cut. Exactly
    the shot-boundary pipeline shape: decode -> per-frame feature ->
    ordered diff -> threshold -> per-video rollup; the real pixel
    decode slots into a mapInPandas between expansion and diff
    without touching the plan's skeleton.

    100 TB: expansion is sequence+explode (JVM); the lag window and
    the rollup cluster on doc_id — one exchange; per-video state is
    one row however long the video."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        (F.octet_length(F.encode("text", "utf-8")) % 120 + 1).alias("n_frames"),
    )
    frames = d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(12))
        ).alias("fi"),
    ).select(
        "doc_id", F.col("fi").cast("long").alias("frame_idx")
    ).select(
        "doc_id", "frame_idx",
        (
            (F.col("doc_id") * 7 + F.expr("frame_idx div 36") * 83) % 200
            + F.col("frame_idx") % 3
        ).alias("luma"),
    )
    delta = F.abs(
        F.col("luma")
        - F.lag("luma").over(Window.partitionBy("doc_id").orderBy("frame_idx"))
    )
    cuts = frames.select("doc_id", "frame_idx", "luma", delta.alias("delta"))
    return (
        cuts.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.count_if(F.col("delta") >= 16).alias("n_cuts"),
            F.min(F.when(F.col("delta") >= 16, F.col("frame_idx")))
            .cast("long").alias("first_cut_idx"),
        )
        .orderBy("doc_id")
    )


@query(
    "x5_mp4_boxes",
    oracle="""
SELECT doc_id,
       CAST(600 + doc_id % 1000 AS BIGINT) AS mp4_timescale,
       CAST((600 + doc_id % 1000) * (doc_id % 300 + 1) AS BIGINT)
         AS mp4_duration,
       CAST((doc_id % 300 + 1) * 1000 AS BIGINT) AS duration_ms,
       CAST(doc_id % 3 + 1 AS BIGINT) AS n_traks,
       CAST(doc_id % 1280 + 16 + doc_id % 3 AS BIGINT) AS max_width,
       CAST(doc_id % 720 + 16 + doc_id % 3 AS BIGINT) AS max_height,
       CAST(5 + 2 * (doc_id % 3 + 1) AS BIGINT) AS n_boxes
FROM documents
ORDER BY doc_id
""",
)
def x5_mp4_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5g: REAL ISO-BMFF (MP4) box walking, stdlib-only — the video
    container sibling of the JPEG marker walk: a valid box tree
    (ftyp → variable-size free padding → moov{mvhd, n × trak{tkhd}} →
    mdat) is built per document and parsed by the genuine recursive
    walk (uint32 big-endian size + fourcc, recurse into containers,
    fixed-point 16.16 track dimensions). The free-box padding shifts
    every moov offset per document, so only a correct walk recovers
    timescale/duration/track geometry; the oracle replays the
    generator arithmetic and the value hash proves the walk. Same
    mapInPandas shape a production video-metadata pass uses (swap in
    ffprobe/PyAV for codec-level fields)."""
    import struct

    d = load(spark, sf_dir, "documents").select("doc_id")

    def build_and_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def box(fourcc: bytes, payload: bytes) -> bytes:
            return struct.pack(">I", 8 + len(payload)) + fourcc + payload

        def make_mp4(ts: int, dur: int, traks: list, pad: int) -> bytes:
            ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
            free = box(b"free", b"\x00" * pad)
            mvhd = box(
                b"mvhd",
                b"\x00\x00\x00\x00"              # version 0 + flags
                + struct.pack(">II", 0, 0)        # ctime, mtime
                + struct.pack(">II", ts, dur)     # timescale, duration
                + b"\x00" * 80,                   # rate..next_track_id
            )
            trak_boxes = b""
            for w, h in traks:
                tkhd = box(
                    b"tkhd",
                    b"\x00\x00\x00\x07"
                    + struct.pack(">III", 0, 0, 1)   # ctime, mtime, id
                    + b"\x00" * 4                    # reserved
                    + struct.pack(">I", dur)
                    + b"\x00" * 52                   # reserved..matrix
                    + struct.pack(">II", w << 16, h << 16),
                )
                trak_boxes += box(b"trak", tkhd)
            moov = box(b"moov", mvhd + trak_boxes)
            return ftyp + free + moov + box(b"mdat", b"\xab" * 16)

        def walk(b: bytes) -> tuple:
            st = {"ts": None, "dur": None, "w": 0, "h": 0, "nt": 0, "nb": 0}

            def scan(buf: bytes) -> None:
                i = 0
                while i + 8 <= len(buf):
                    (size,) = struct.unpack(">I", buf[i : i + 4])
                    four = buf[i + 4 : i + 8]
                    assert size >= 8, f"bad box size at {i}"
                    st["nb"] += 1
                    payload = buf[i + 8 : i + size]
                    if four in (b"moov", b"trak"):
                        if four == b"trak":
                            st["nt"] += 1
                        scan(payload)
                    elif four == b"mvhd":
                        st["ts"], st["dur"] = struct.unpack(
                            ">II", payload[12:20]
                        )
                    elif four == b"tkhd":
                        w, h = struct.unpack(">II", payload[76:84])
                        st["w"] = max(st["w"], w >> 16)
                        st["h"] = max(st["h"], h >> 16)
                    i += size

            scan(b)
            assert st["ts"] is not None, "no mvhd found"
            return (
                st["ts"], st["dur"], st["dur"] * 1000 // st["ts"],
                st["nt"], st["w"], st["h"], st["nb"],
            )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                ts = 600 + i % 1000
                dur = ts * (i % 300 + 1)
                traks = [
                    (i % 1280 + 16 + t, i % 720 + 16 + t)
                    for t in range(i % 3 + 1)
                ]
                parsed = walk(make_mp4(ts, dur, traks, (i % 5) * 7))
                rows.append((i, *parsed))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "mp4_timescale", "mp4_duration",
                    "duration_ms", "n_traks", "max_width", "max_height",
                    "n_boxes",
                ],
            )

    return d.mapInPandas(
        build_and_parse,
        schema="doc_id long, mp4_timescale long, mp4_duration long, "
        "duration_ms long, n_traks long, max_width long, "
        "max_height long, n_boxes long",
    ).orderBy("doc_id")


@query(
    "x5_media_dedup_groups",
    oracle="""
WITH RECURSIVE hx AS (
  SELECT doc_id,
         rpad(substr(hex(encode(text)), 1, 128), 128, '20') AS h
  FROM documents
), px AS (
  SELECT doc_id,
         [(strpos('0123456789ABCDEF', substr(h, 2*i+1, 1)) - 1) * 16
          + strpos('0123456789ABCDEF', substr(h, 2*i+2, 1)) - 1
          FOR i IN range(0,64,1)] AS bytes
  FROM hx
), m AS (
  SELECT doc_id, bytes, list_sum(bytes)/64.0 AS mu FROM px
), bits AS (
  SELECT doc_id,
         [CASE WHEN bytes[i+1] > mu THEN 1 ELSE 0 END
          FOR i IN range(0,64,1)] AS bit
  FROM m
), bands AS (
  SELECT doc_id,
    list_sum([bit[j+1]    << j FOR j IN range(0,16,1)]) AS b0,
    list_sum([bit[16+j+1] << j FOR j IN range(0,16,1)]) AS b1,
    list_sum([bit[32+j+1] << j FOR j IN range(0,16,1)]) AS b2,
    list_sum([bit[48+j+1] << j FOR j IN range(0,16,1)]) AS b3
  FROM bits
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.b0,b.b0)::BIGINT) + bit_count(xor(a.b1,b.b1)::BIGINT)
      + bit_count(xor(a.b2,b.b2)::BIGINT) + bit_count(xor(a.b3,b.b3)::BIGINT)
      <= 3
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach(a, b) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
)
SELECT a AS doc_id, min(b) AS group_id FROM reach GROUP BY a
ORDER BY doc_id
""",
)
def x5_media_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEDIA dedup-cluster assignment — the x2_dedup_groups pipeline
    applied to the perceptual-hash geometry: pHash near-dup pairs
    (Hamming ≤ 3 over the 64-bit aHash, found by the pigeonhole band
    join in x5_phash_neardup) feed the same confluent min-label
    connected components, yielding (doc_id, group_id = min member) —
    the keep-one-per-visual-duplicate stage of an image/video corpus
    pipeline. The oracle replays the full chain: byte-exact hash bits,
    banded pair predicate, recursive-CTE transitive closure.

    100 TB: pairs come from the banded equi-join (never all-pairs),
    components from the degree-bounded min propagation — the identical
    economics as text dedup, because the operator stack is shared."""
    pairs = x5_phash_neardup(spark, sf_dir).select("id_a", "id_b")
    from recipes_spark.operators.dedup import connected_components

    nodes = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("node")
    )
    comps = connected_components(
        nodes, pairs, node_col="node", src_col="id_a", dst_col="id_b"
    )
    return (
        comps.select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("group_id"),
        )
        .orderBy("doc_id")
    )
