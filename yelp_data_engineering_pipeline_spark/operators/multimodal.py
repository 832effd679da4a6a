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


# --- catalog: the decode stage itself (Python kernel → rows-only check) ------
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake decode over mapInPandas; no SQL oracle (the
    kernel is Python) → the driver records a rows-only check."""
    return decode_media(documents_as_media(spark, sf_dir))


register("mm_decode_stub", mm_decode_stub, None)
