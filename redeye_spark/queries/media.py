"""Multimodal queries: binary metadata, PPM image + WAV audio
decode, frame sampling."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

from ..functions.logparse import FORMAT_COMMON  # noqa: F401
from ..operators import enrich as enrich_op  # noqa: F401
from ..operators import parse_op, route as route_op, tokenize_op  # noqa: F401
from ..operators import aggregate as agg_op  # noqa: F401
from ._shared import (  # noqa: F401
    _OFFS, _STATUS, _frags, _oracle_base, _parsed, _spark_lines, _spread,
    _utc, _PARSE_COLS,
)

# Every media builder below manufactures binary payloads from document
# text with CHARACTER functions (rpad/substr) and then utf-8 encodes,
# while the decoders and declared chunk sizes count BYTES. That is only
# sound for pure-ASCII text, so the builders enforce the assumption
# with an explicit filter (byte length == char length iff ASCII in
# UTF-8) instead of leaving it implicit; the oracles apply the same cut.
_ASCII_ONLY = "octet_length(text) = length(text)"
_SQL_ASCII_ONLY = "octet_length(encode(text)) = length(text)"


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media-column plumbing: metadata projection without decode
    (documents.text bytes stand in for opaque payloads)."""
    from ..operators import multimodal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(_ASCII_ONLY)
    media = docs.select(
        F.col("doc_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.substring(F.col("text"), 1, 64), "utf-8").alias("payload"),
    )
    m = multimodal.attach_metadata(media)
    return m.select("doc_id", F.col("meta.n_bytes").alias("n_bytes"), F.col("meta.magic").alias("magic"))


SQL_MULTIMODAL_META = f"""
SELECT doc_id,
       CAST(octet_length(encode(substr(text, 1, 64))) AS BIGINT) AS n_bytes,
       upper(hex(encode(substr(text, 1, 4)))) AS magic
FROM documents WHERE {_SQL_ASCII_ONLY}
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling fan-out (doc -> up to 8 fixed-size
    frames), the explode-shaped operator real video decode plugs into.
    The corpus text is pure ASCII, so byte frames decode back to strings
    and the oracle re-derives them with substr arithmetic."""
    from ..operators import multimodal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(_ASCII_ONLY)
    media = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("video").alias("media_type"),
        F.encode(F.substring(F.col("text"), 1, 64), "utf-8").alias("payload"),
    )
    frames = multimodal.sample_frames(media, every_n_bytes=16, max_frames=8)
    return frames.select(
        "doc_id", "frame_idx", F.decode("frame_bytes", "utf-8").alias("frame_str")
    )


SQL_FRAME_SAMPLE = f"""
WITH m AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, substr(text, 1, 64) AS payload
  FROM documents WHERE {_SQL_ASCII_ONLY}
)
SELECT doc_id, CAST(i - 1 AS INT) AS frame_idx,
       substr(payload, (i - 1) * 16 + 1, 16) AS frame_str
FROM m, UNNEST(generate_series(1,
       least(8, greatest(1, CAST(floor(length(payload) / 16) AS INT))))) AS t(i)
"""


def q_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode (fake=False): each document's ASCII text is
    wrapped into a valid binary-PPM (P6) payload — header with
    doc_id-derived dimensions, pixel bytes = the text rpad-repeated to
    width*height*3 — and decoded by the pure-numpy PPM parser
    (operators/multimodal._decode_ppm). The oracle re-derives width,
    height, and all 8 histogram features from the same byte arithmetic
    in SQL. Features come back as 8 scalar columns (not an array) so the
    cross-engine value hash is type-stable; float32 -> double -> round(6)
    is bit-identical in both engines (same IEEE ops)."""
    from ..operators import multimodal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(_ASCII_ONLY)
    media = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.encode(
            F.concat(
                F.format_string(
                    "P6\n%d %d\n255\n",
                    (F.col("doc_id") % 5 + 4).cast("int"),
                    (F.col("doc_id") % 4 + 3).cast("int"),
                ),
                F.expr(
                    "rpad(text, cast((doc_id % 5 + 4) * (doc_id % 4 + 3) * 3 as int), text)"
                ),
            ),
            "utf-8",
        ).alias("payload"),
    )
    feats = multimodal.decode_image(media, fake=False)
    return feats.select(
        "doc_id",
        "width",
        "height",
        *[
            F.round(F.col("features")[k].cast("double"), 6).alias(f"f{k}")
            for k in range(8)
        ],
    )


_DECODE_BUCKETS = ",\n         ".join(
    f"sum(CASE WHEN b = {k} THEN 1 ELSE 0 END) AS c{k}" for k in range(8)
)
_DECODE_FEATS = ",\n       ".join(
    f"round(CAST(CAST(CAST(c{k} AS DOUBLE) / n AS REAL) AS DOUBLE), 6) AS f{k}" for k in range(8)
)
SQL_DECODE_IMAGE = f"""
WITH px AS (
  SELECT doc_id,
         CAST(doc_id % 5 + 4 AS INT) AS w,
         CAST(doc_id % 4 + 3 AS INT) AS h,
         rpad(text, CAST((doc_id % 5 + 4) * (doc_id % 4 + 3) * 3 AS INT), text) AS pix
  FROM documents WHERE {_SQL_ASCII_ONLY}
),
u AS (
  SELECT doc_id, w, h, (ascii(substr(pix, CAST(i AS INT), 1)) // 32) AS b
  FROM px, unnest(generate_series(1, length(pix))) AS t(i)
),
c AS (
  SELECT doc_id, w, h, count(*) AS n,
         {_DECODE_BUCKETS}
  FROM u GROUP BY doc_id, w, h
)
SELECT CAST(doc_id AS VARCHAR) AS doc_id, w AS width, h AS height,
       {_DECODE_FEATS}
FROM c
"""



def q_decode_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode: each document's ASCII text becomes the PCM
    data of a valid 8-bit mono RIFF/WAVE payload (all header bytes are
    <128, so the chr()-built header survives UTF-8 encode byte-exact)
    and is chunk-walked by the pure-numpy WAV parser
    (operators/multimodal._decode_wav). The oracle re-derives sample
    counts and all 8 PCM-byte histogram features from the same rpad
    arithmetic in SQL — it never needs to build the binary, only to
    predict the decoder's output."""
    from ..operators import multimodal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(_ASCII_ONLY)
    L = "CAST(doc_id % 50 + 20 AS INT)"
    nul = "chr(0)"
    header = (
        f"'RIFF' || chr(36 + {L}) || {nul} || {nul} || {nul} || 'WAVEfmt ' || "
        f"chr(16) || {nul} || {nul} || {nul} || "          # fmt size 16
        f"chr(1) || {nul} || chr(1) || {nul} || "          # PCM, mono
        f"chr(64) || chr(31) || {nul} || {nul} || "        # rate 8000
        f"chr(64) || chr(31) || {nul} || {nul} || "        # byte rate 8000
        f"chr(1) || {nul} || chr(8) || {nul} || "          # align 1, 8-bit
        f"'data' || chr({L}) || {nul} || {nul} || {nul}"
    )
    media = docs.selectExpr(
        "CAST(doc_id AS STRING) AS doc_id",
        f"encode({header} || rpad(text, {L}, text), 'utf-8') AS payload",
    )
    feats = multimodal.decode_audio(media)
    return feats.select(
        "doc_id",
        "sample_rate",
        "n_channels",
        "n_samples",
        *[
            F.round(F.col("features")[k].cast("double"), 6).alias(f"f{k}")
            for k in range(8)
        ],
    )


SQL_DECODE_AUDIO = f"""
WITH px AS (
  SELECT doc_id,
         CAST(doc_id % 50 + 20 AS INT) AS L,
         rpad(text, CAST(doc_id % 50 + 20 AS INT), text) AS pcm
  FROM documents WHERE {_SQL_ASCII_ONLY}
),
u AS (
  SELECT doc_id, L, (ascii(substr(pcm, CAST(i AS INT), 1)) // 32) AS b
  FROM px, unnest(generate_series(1, length(pcm))) AS t(i)
),
c AS (
  SELECT doc_id, L, count(*) AS n,
         {_DECODE_BUCKETS}
  FROM u GROUP BY doc_id, L
)
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       8000 AS sample_rate, 1 AS n_channels, CAST(L AS BIGINT) AS n_samples,
       {_DECODE_FEATS}
FROM c
"""



def q_decode_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode: each document's ASCII text becomes the planar
    frame data of a valid YUV4MPEG2 (Y4M) container — stream header
    with doc_id-derived geometry, doc_id%3+1 FRAME chunks whose bodies
    are the text rpad-repeated to 3*w*h (C444) — and frame-walked by
    the pure-numpy Y4M parser (operators/multimodal._decode_y4m). The
    oracle predicts geometry and all 8 YUV-byte histogram features from
    the same rpad arithmetic over ONE frame body: every frame repeats
    the same bytes, and an n-fold repetition cancels exactly in the
    L1 normalization ((n*c)/(n*s) and c/s round identically in IEEE
    double), so the oracle never builds the container."""
    from ..operators import multimodal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(_ASCII_ONLY)
    w = "CAST(doc_id % 5 + 2 AS INT)"
    h = "CAST(doc_id % 4 + 2 AS INT)"
    nf = "CAST(doc_id % 3 + 1 AS INT)"
    body = f"rpad(text, CAST(3 * (doc_id % 5 + 2) * (doc_id % 4 + 2) AS INT), text)"
    media = docs.selectExpr(
        "CAST(doc_id AS STRING) AS doc_id",
        f"encode('YUV4MPEG2 W' || {w} || ' H' || {h} || ' F30:1 C444' || chr(10)"
        f" || repeat('FRAME' || chr(10) || {body}, {nf}), 'utf-8') AS payload",
    )
    feats = multimodal.decode_video(media)
    return feats.select(
        "doc_id", "width", "height", "fps_num", "fps_den", "n_frames",
        *[
            F.round(F.col("features")[k].cast("double"), 6).alias(f"f{k}")
            for k in range(8)
        ],
    )


SQL_DECODE_VIDEO = f"""
WITH px AS (
  SELECT doc_id,
         CAST(doc_id % 5 + 2 AS INT) AS w,
         CAST(doc_id % 4 + 2 AS INT) AS h,
         CAST(doc_id % 3 + 1 AS BIGINT) AS nf,
         rpad(text, CAST(3 * (doc_id % 5 + 2) * (doc_id % 4 + 2) AS INT), text) AS body
  FROM documents WHERE {_SQL_ASCII_ONLY}
),
u AS (
  SELECT doc_id, w, h, nf, (ascii(substr(body, CAST(i AS INT), 1)) // 32) AS b
  FROM px, unnest(generate_series(1, length(body))) AS t(i)
),
c AS (
  SELECT doc_id, w, h, nf, count(*) AS n,
         {_DECODE_BUCKETS}
  FROM u GROUP BY doc_id, w, h, nf
)
SELECT CAST(doc_id AS VARCHAR) AS doc_id, w AS width, h AS height,
       30 AS fps_num, 1 AS fps_den, nf AS n_frames,
       {_DECODE_FEATS}
FROM c
"""


def q_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BMP decode: a binary 54-byte BITMAPINFOHEADER (built with
    unhex — BMP headers carry NUL and little-endian length bytes, so the
    chr()-ASCII trick the WAV builder uses doesn't apply) is prepended
    to the document's ASCII text rpad-repeated to exactly width*3*height
    bytes. Widths are 4 or 8 so each row's 3*w bytes already sit on the
    4-byte BMP row boundary — no padding, so the pixel stream equals the
    rpad bytes and the oracle predicts every histogram bucket with the
    SAME byte arithmetic as the PPM oracle."""
    from ..operators import multimodal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(_ASCII_ONLY)
    w = "(doc_id % 2) * 4 + 4"
    h = "doc_id % 4 + 3"
    img = f"({w}) * 3 * ({h})"
    hexfmt = (
        "424d%02x000000000000003600000028000000%02x000000%02x000000"
        "0100180000000000%02x000000130b0000130b00000000000000000000"
    )
    media = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(
            F.unhex(F.format_string(
                hexfmt,
                F.expr(f"CAST(54 + {img} AS INT)"),
                F.expr(f"CAST({w} AS INT)"),
                F.expr(f"CAST({h} AS INT)"),
                F.expr(f"CAST({img} AS INT)"),
            )),
            F.encode(F.expr(f"rpad(text, CAST({img} AS INT), text)"), "utf-8"),
        ).alias("payload"),
    )
    feats = multimodal.decode_image(media, fake=False)
    return feats.select(
        "doc_id",
        "width",
        "height",
        *[
            F.round(F.col("features")[k].cast("double"), 6).alias(f"f{k}")
            for k in range(8)
        ],
    )


SQL_DECODE_BMP = f"""
WITH px AS (
  SELECT doc_id,
         CAST((doc_id % 2) * 4 + 4 AS INT) AS w,
         CAST(doc_id % 4 + 3 AS INT) AS h,
         rpad(text, CAST(((doc_id % 2) * 4 + 4) * 3 * (doc_id % 4 + 3) AS INT), text) AS pix
  FROM documents WHERE {_SQL_ASCII_ONLY}
),
u AS (
  SELECT doc_id, w, h, (ascii(substr(pix, CAST(i AS INT), 1)) // 32) AS b
  FROM px, unnest(generate_series(1, length(pix))) AS t(i)
),
c AS (
  SELECT doc_id, w, h, count(*) AS n,
         {_DECODE_BUCKETS}
  FROM u GROUP BY doc_id, w, h
)
SELECT CAST(doc_id AS VARCHAR) AS doc_id, w AS width, h AS height,
       {_DECODE_FEATS}
FROM c
"""


QUERIES = {
    "multimodal_meta": q_multimodal_meta,
    "frame_sample": q_frame_sample,
    "decode_image": q_decode_image,
    "decode_bmp": q_decode_bmp,
    "decode_audio": q_decode_audio,
    "decode_video": q_decode_video,
}

ORACLES = {
    "multimodal_meta": SQL_MULTIMODAL_META,
    "frame_sample": SQL_FRAME_SAMPLE,
    "decode_image": SQL_DECODE_IMAGE,
    "decode_bmp": SQL_DECODE_BMP,
    "decode_audio": SQL_DECODE_AUDIO,
    "decode_video": SQL_DECODE_VIDEO,
}
