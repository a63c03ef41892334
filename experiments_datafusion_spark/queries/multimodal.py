"""Multimodal-column queries: binary payload metadata (oracle-checked — the
JVM-side part) and pandas-UDF feature extraction / frame sampling
(rows-only: Python-side stubs with real Spark plumbing)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from experiments_datafusion_spark.io import table
from experiments_datafusion_spark.operators import multimodal as M
from experiments_datafusion_spark.queries import register


@register(
    "mm_metadata",
    tags=("llm", "multimodal"),
    oracle="""
SELECT
  doc_id AS media_id,
  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
  CAST(octet_length(encode(text)) AS BIGINT)             AS n_bytes,
  md5(text)                                              AS checksum
FROM documents
""",
)
def mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads — the prunable scalar
    columns that let 100 TB of payload bytes stay unread for metadata-only
    queries."""
    media = M.attach_media(table(spark, sf_dir, "documents"))
    return media.select("media_id", "media_type", "n_bytes", "checksum")


@register(
    "mm_dedup_payload",
    tags=("llm", "multimodal", "dedup"),
    oracle="""
SELECT md5(text) AS checksum,
       min(doc_id) AS keeper,
       count(*)    AS n_copies,
       CAST(min(octet_length(encode(text))) AS BIGINT) AS n_bytes
FROM documents
GROUP BY 1
""",
)
def mm_dedup_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binary-payload dedup by content checksum — the first pass of
    any multimodal ingest (identical images/audio clips collapse before a
    single byte is decoded).  Group-by on the checksum column only; payload
    bytes stay unread (column pruning)."""
    media = M.attach_media(table(spark, sf_dir, "documents"))
    return media.groupBy("checksum").agg(
        F.min("media_id").alias("keeper"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min("n_bytes").alias("n_bytes"),
    )


@register(
    "mm_features",
    tags=("llm", "multimodal"),
    oracle=f"""
-- replays the closed-form WAV corpus: n = 100 + doc_id%400 PCM16 samples at
-- {M.WAV_RATE} Hz, sample[i] = (doc_id*31 + i*17) mod 2001 - 1000 (see
-- operators/multimodal.py attach_wav_media); the Spark side decodes the
-- actual RIFF bytes with the stdlib wave module — a REAL decode under a
-- SQL-replayable oracle
-- EXACT integer half-up quantization (x*2*scale + n) // (2*n) on both
-- sides: float round() at a half-ulp boundary splits across engines
WITH f AS (
  SELECT doc_id, 100 + doc_id % 400 AS n FROM documents
),
s AS (
  SELECT f.doc_id, f.n,
         abs((f.doc_id * 31 + t.i * 17) % 2001 - 1000) AS a
  FROM f, UNNEST(range(0, f.n)) AS t(i)
)
SELECT doc_id AS media_id,
       1 AS n_channels,
       {M.WAV_RATE} AS sample_rate,
       CAST(n AS BIGINT) AS n_frames,
       CAST((n * 2000000 + {M.WAV_RATE}) // (2 * {M.WAV_RATE}) AS DOUBLE)
         / 1000000 AS duration_sec,
       CAST((sum(a) * 20000 + n) // (2 * n) AS DOUBLE) / 10000 AS mean_abs_amp
FROM s
GROUP BY doc_id, n
""",
)
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio feature extraction: build RIFF/WAVE payloads (PCM16 mono,
    closed-form waveform per doc_id), then decode the actual bytes with the
    stdlib ``wave`` codec in mapInPandas and emit header + amplitude
    features.  The oracle replays the closed form in SQL — so the round
    trip encode->RIFF bytes->decode is differential-tested end to end.
    Image/video decode remains the documented stub (decode_real)."""
    media = M.attach_wav_media(table(spark, sf_dir, "documents"))
    return M.decode_wav_features(media)


@register(
    "mm_frame_sample",
    tags=("llm", "multimodal"),
    oracle="""
-- the mapInPandas slicing is replayable in SQL: payload = utf8(text), so
-- frame i covers bytes [i*64, i*64+64) and its size is closed-form
WITH m AS (
  SELECT doc_id AS media_id, octet_length(encode(text)) AS len FROM documents
)
SELECT media_id,
       CAST(t.i AS BIGINT) AS frame_no,
       CAST(least(64, len - t.i * 64) AS BIGINT) AS frame_bytes
FROM m, UNNEST(range(0, 4)) AS t(i)
WHERE t.i * 64 < len
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (1 row -> N frames via mapInPandas, fixed
    64-byte stride, max 4 frames).  The emitted frame SIZES are a closed
    form of payload length, so the Python slicing is differential-tested
    against a SQL replay even though the bytes themselves stay opaque."""
    media = M.attach_media(table(spark, sf_dir, "documents"))
    frames = M.frame_sample(media)
    return frames.select(
        "media_id",
        "frame_no",
        F.length("frame").cast("bigint").alias("frame_bytes"),
    )


@register(
    "mm_png_features",
    tags=("llm", "multimodal"),
    oracle="""
-- Closed-form replay of the PNG round trip (operators/multimodal.py
-- attach_png_media: pixel[k] = (doc_id*7 + k) % 256 row-major over a
-- (16 + doc_id%17) x (16 + doc_id%13) grayscale image; the Spark side
-- decodes the actual PNG bytes — chunk parse, CRC check, inflate,
-- unfilter — with stdlib zlib/struct).  The pixel sum over k in [0, n) is
-- full cycles of sum(0..255)=32640 plus a wrapped partial run; the mean
-- uses the same exact half-up integer rounding as the decoder.
WITH d AS (
  SELECT doc_id, 16 + doc_id % 17 AS w, 16 + doc_id % 13 AS h,
         (doc_id * 7) % 256 AS a
  FROM documents
),
e AS (
  SELECT doc_id, w, h, a, w * h AS n, (w * h) % 256 AS r, (w * h) // 256 AS cyc
  FROM d
),
f AS (
  SELECT doc_id, w, h, n,
         cyc * 32640 + r * a + r * (r - 1) // 2
           - 256 * greatest(0, a + r - 256) AS s
  FROM e
)
SELECT doc_id AS media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       n AS n_pixels, ((s * 20000 + n) // (2 * n)) / 10000.0 AS mean_pixel
FROM f
""",
)
def mm_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image feature extraction: build spec-compliant grayscale PNGs
    (closed-form pixels per doc_id), decode the actual bytes with the
    stdlib zlib/struct codec in mapInPandas, and emit header + pixel
    features — the image twin of mm_features' WAV round trip.  Round 5 adds
    the real JPEG codec (mm_jpeg_features); only video stays gated."""
    media = M.attach_png_media(table(spark, sf_dir, "documents"))
    return M.decode_png_features(media)


@register(
    "mm_bmp_features",
    tags=("llm", "multimodal"),
    oracle="""
-- Closed-form replay of the BMP round trip (operators/multimodal.py
-- attach_bmp_media: pixel[k] = (doc_id*13 + k) % 256 row-major over a
-- (8 + doc_id%23) x (8 + doc_id%19) grayscale image; the Spark side
-- decodes the actual BMP bytes — dual headers, palette validation,
-- bottom-up rows, stride padding).  Same cycle + wrapped-run pixel-sum
-- algebra and exact half-up mean as the PNG oracle.
WITH d AS (
  SELECT doc_id, 8 + doc_id % 23 AS w, 8 + doc_id % 19 AS h,
         (doc_id * 13) % 256 AS a
  FROM documents
),
e AS (
  SELECT doc_id, w, h, a, w * h AS n, (w * h) % 256 AS r, (w * h) // 256 AS cyc
  FROM d
),
f AS (
  SELECT doc_id, w, h, n,
         cyc * 32640 + r * a + r * (r - 1) // 2
           - 256 * greatest(0, a + r - 256) AS s
  FROM e
)
SELECT doc_id AS media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       n AS n_pixels, ((s * 20000 + n) // (2 * n)) / 10000.0 AS mean_pixel
FROM f
""",
)
def mm_bmp_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image feature extraction #2: build spec-compliant 8-bit
    paletted grayscale BMPs (closed-form pixels per doc_id), decode the
    actual bytes — file+info headers, identity-palette validation,
    bottom-up row order, 4-byte stride padding — and emit header + pixel
    features.  Third real stdlib codec beside WAV and PNG; JPEG/video
    remain the documented environment gate (decode_real)."""
    media = M.attach_bmp_media(table(spark, sf_dir, "documents"))
    return M.decode_bmp_features(media)


@register(
    "mm_thumbnail",
    tags=("llm", "multimodal"),
    oracle="""
-- Closed-form replay of decode + nearest-neighbor 8x8 resize: the PNG
-- payload's pixel[k] = (doc_id*7 + k) % 256 row-major over
-- (16 + doc_id%17) x (16 + doc_id%13) (operators/multimodal.py
-- attach_png_media), and the NN kernel samples k = ((i*h)//8)*w + (j*w)//8
-- for i,j in 0..7 — all integer index math, so the 64 sampled values are
-- reproduced exactly; the Spark side decodes and gathers REAL bytes.
WITH d AS (
  SELECT doc_id, 16 + doc_id % 17 AS w, 16 + doc_id % 13 AS h,
         (doc_id * 7) % 256 AS a
  FROM documents
),
g AS (SELECT unnest(generate_series(0, 7)) AS i),
t AS (
  SELECT d.doc_id, d.w, d.h,
         (d.a + ((gi.i * d.h) // 8) * d.w + ((gj.i * d.w) // 8)) % 256 AS val
  FROM d CROSS JOIN g gi CROSS JOIN g gj
)
SELECT doc_id AS media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(sum(val) AS BIGINT) AS thumb_sum,
       ((sum(val) * 20000 + 64) // 128) / 10000.0 AS thumb_mean
FROM t GROUP BY doc_id, w, h
""",
)
def mm_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize: decode each grayscale PNG payload and
    nearest-neighbor downsample to 8x8 (operators/multimodal.py
    resize_thumbnail) — the decode-then-shrink preprocessing pass of a
    vision-data pipeline, differential-tested because the sampling
    indices are exact integer math over closed-form pixels."""
    media = M.attach_png_media(table(spark, sf_dir, "documents"))
    return M.resize_thumbnail(media)


@register(
    "mm_jpeg_features",
    tags=("llm", "multimodal"),
    oracle="""
-- Closed-form replay of the JPEG round trip (operators/multimodal.py
-- attach_jpeg_media: 8x8-block-constant tiles, tile value
-- 2*((doc_id*31 + ty*7 + tx*13) % 128) over a (2+doc_id%5) x
-- (2+(doc_id//5)%4) tile grid; the Spark side decodes the actual
-- baseline-JPEG bytes — marker parse, canonical Huffman, dequantize,
-- IDCT — with jpeg_codec.py).  Even tile values make Annex-K DC
-- quantization lossless (8*(v-128) divisible by quantum 16; AC all
-- zero), so the decoded pixels equal the generated tiles EXACTLY and
-- this oracle's tile algebra predicts them; same half-up mean as the
-- PNG/BMP oracles.
WITH d AS (
  SELECT doc_id, 2 + doc_id % 5 AS ntx, 2 + (doc_id // 5) % 4 AS nty
  FROM documents
),
tiles AS (
  SELECT d.doc_id, d.ntx, d.nty,
         2 * ((d.doc_id * 31 + ty.v * 7 + tx.v * 13) % 128) AS tv
  FROM d,
       UNNEST(generate_series(0, d.nty - 1)) AS ty(v),
       UNNEST(generate_series(0, d.ntx - 1)) AS tx(v)
),
agg AS (
  SELECT doc_id, any_value(ntx) AS ntx, any_value(nty) AS nty,
         sum(tv) * 64 AS s, count(*) * 64 AS n,
         count(DISTINCT tv) AS n_levels
  FROM tiles GROUP BY doc_id
)
SELECT doc_id AS media_id,
       CAST(ntx * 8 AS INT) AS width,
       CAST(nty * 8 AS INT) AS height,
       CAST(n AS BIGINT) AS n_pixels,
       ((s * 20000 + n) // (2 * n)) / 10000.0 AS mean_pixel,
       CAST(n_levels AS BIGINT) AS n_levels
FROM agg
""",
)
def mm_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG feature extraction (round 5, closing the third and last
    codec stub except video): build baseline grayscale JPEGs from
    block-constant even-valued tiles (the quantization-lossless regime —
    see operators/multimodal.py), decode the ACTUAL entropy-coded bytes
    with the pure-Python T.81 codec in mapInPandas, and emit header +
    pixel features.  The differential check verifies the full encode ->
    Huffman stream -> decode -> IDCT chain against tile algebra."""
    media = M.attach_jpeg_media(table(spark, sf_dir, "documents"))
    return M.decode_jpeg_features(media)


@register(
    "mm_avi_features",
    tags=("llm", "multimodal", "video"),
    oracle="""
-- Closed-form replay of the AVI round trip (operators/multimodal.py
-- attach_avi_media: RIFF/AVI container with uncompressed bottom-up
-- stride-padded DIB frames; pixel(f,y,x) = (doc_id*11 + f*17 + y*5 +
-- x*3) % 256 over a (2+doc%4)-frame (4+doc%6) x (5+doc%8) video; the
-- Spark side walks the actual RIFF grammar, parses avih/strh/strf,
-- extracts and un-pads every 00db frame).  px_sum and inter-frame
-- motion_sum are exact integers, so the oracle replays the pixel
-- formula directly.
WITH d AS (
  SELECT doc_id, 2 + doc_id % 4 AS nf, 4 + doc_id % 6 AS h, 5 + doc_id % 8 AS w
  FROM documents
),
px AS (
  SELECT d.doc_id, d.nf, d.h, d.w, f.v AS f, y.v AS y, x.v AS x,
         (d.doc_id * 11 + f.v * 17 + y.v * 5 + x.v * 3) % 256 AS p
  FROM d,
       UNNEST(generate_series(0, d.nf - 1)) AS f(v),
       UNNEST(generate_series(0, d.h - 1)) AS y(v),
       UNNEST(generate_series(0, d.w - 1)) AS x(v)
)
SELECT doc_id AS media_id,
       CAST(any_value(nf) AS INT) AS n_frames,
       CAST(any_value(w) AS INT) AS width,
       CAST(any_value(h) AS INT) AS height,
       CAST(sum(p) AS BIGINT) AS px_sum,
       CAST(sum(CASE WHEN f > 0 THEN
           abs(p - (doc_id * 11 + (f - 1) * 17 + y * 5 + x * 3) % 256)
           ELSE 0 END) AS BIGINT) AS motion_sum
FROM px GROUP BY doc_id
""",
)
def mm_avi_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-CONTAINER decode (round 5): build RIFF/AVI payloads with
    uncompressed DIB frames (widths deliberately include non-multiples of
    4, so stride padding is genuinely exercised), walk the actual RIFF
    grammar in mapInPandas — lists, stream headers, frame chunks — and
    emit per-video pixel-sum + inter-frame motion features.  This narrows
    the video gate to COMPRESSED inter-frame codecs (decode_real); the
    container layer every video pipeline starts with is now real, the
    same honest-boundary pattern as the WAV/PNG/BMP/JPEG codecs."""
    media = M.attach_avi_media(table(spark, sf_dir, "documents"))
    return M.decode_avi_features(media)
