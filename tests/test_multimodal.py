"""Multimodal binary-column plumbing tests: schema, Arrow batch shape,
deterministic stub decode."""

from __future__ import annotations

import hashlib

from yelp_data_engineering_pipeline_spark.operators.multimodal import (
    DECODED_SCHEMA,
    decode_media,
    decode_stub,
    documents_as_media,
)


def test_decode_media_schema_and_values(spark, sf_dir):
    media = documents_as_media(spark, sf_dir)
    decoded = decode_media(media)
    assert decoded.schema == DECODED_SCHEMA
    rows = decoded.collect()
    assert len(rows) == media.count()
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in rows[:20]:
        payload = src[r["media_id"]]
        assert r["n_bytes"] == len(payload)
        assert r["checksum"] == hashlib.md5(payload).hexdigest()
        assert (r["width"], r["height"]) == decode_stub(payload)


def test_decode_stub_deterministic_and_empty_safe():
    assert decode_stub(b"") == (0, 0)
    assert decode_stub(b"abc") == decode_stub(b"abc")
    w, h = decode_stub(bytes([200, 5, 9]))
    assert 1 <= w <= 64 and 1 <= h <= 64
