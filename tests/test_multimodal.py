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


def test_frame_sample_schedule_and_truncation(spark):
    """Frame offsets follow the integer stride schedule; the tail frame
    truncates to the payload end; short payloads yield fewer frames."""
    from yelp_data_engineering_pipeline_spark.operators.multimodal import frame_sample

    media = spark.createDataFrame(
        [(1, bytes(range(100)), "video/fake"), (2, b"abc", "video/fake")],
        "media_id long, payload binary, media_type string",
    )
    rows = {(r["media_id"], r["frame_idx"]): r for r in frame_sample(media).collect()}
    # payload 1: 100 bytes, stride = 100 div 8 = 12 → 8 frames at 0,12,...,84
    for i in range(8):
        r = rows[(1, i)]
        assert r["frame_offset"] == i * 12
        assert r["frame_len"] == 16
    # payload 2: 3 bytes, stride = max(1, 0) = 1 → 3 frames, truncated
    assert [(rows[(2, i)]["frame_offset"], rows[(2, i)]["frame_len"]) for i in range(3)] == [
        (0, 3), (1, 2), (2, 1)
    ]
    assert (2, 3) not in rows  # offsets past the payload are dropped


def test_audio_chunks_cover_exactly(spark):
    """Chunk grid covers every sample exactly once; tail chunk is short."""
    from yelp_data_engineering_pipeline_spark.operators.multimodal import audio_chunks

    meta = spark.createDataFrame(
        [(1, 40_000), (2, 16_000), (3, 15_999)], "media_id long, n_samples long"
    )
    rows = [r.asDict() for r in audio_chunks(meta).orderBy("media_id", "chunk_idx").collect()]
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r)
    assert [c["chunk_samples"] for c in per[1]] == [16_000, 16_000, 8_000]
    assert [c["start_sample"] for c in per[1]] == [0, 16_000, 32_000]
    assert [c["chunk_samples"] for c in per[2]] == [16_000]
    assert [c["chunk_samples"] for c in per[3]] == [15_999]
    for cid, chunks in per.items():
        assert sum(c["chunk_samples"] for c in chunks) == {1: 40_000, 2: 16_000, 3: 15_999}[cid]


def test_audio_chunks_empty_clip_and_custom_rate(spark):
    """n_samples=0 yields ZERO chunks (not a descending-sequence pair of
    bogus rows — ADVICE.md r3), and chunk_ms honors a non-default
    sample_rate."""
    from yelp_data_engineering_pipeline_spark.operators.multimodal import audio_chunks

    meta = spark.createDataFrame(
        [(1, 0), (2, 12_000)], "media_id long, n_samples long"
    )
    rows = [r.asDict() for r in audio_chunks(meta, sample_rate=8_000).collect()]
    assert all(r["media_id"] != 1 for r in rows)  # empty clip → no chunks
    two = sorted((r for r in rows if r["media_id"] == 2), key=lambda r: r["chunk_idx"])
    assert [(r["start_sample"], r["chunk_samples"]) for r in two] == [(0, 8_000), (8_000, 4_000)]
    assert [r["chunk_ms"] for r in two] == [1000, 500]  # 8k-rate ms, not 16k
