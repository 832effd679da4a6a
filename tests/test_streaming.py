"""Structured Streaming tests: checkpointed exactly-once ingest with
bizId dedup (ST1/ST6), and parity of the windowed aggregations between
batch and streaming execution."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from tests.yelp_fixtures import make_results, write_ndjson
from yelp_data_engineering_pipeline_spark.streaming.ingest import run_ingest_available_now
from yelp_data_engineering_pipeline_spark.streaming.windows import tumbling_agg


def test_streaming_ingest_dedup_and_resume(spark, tmp_path):
    in_dir, out_dir, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    in_dir.mkdir()
    rows = make_results(30, seed=5)
    write_ndjson(rows, in_dir / "batch1.ndjson")
    # duplicate 10 of them in a second file → dedup must drop them
    write_ndjson(rows[:10], in_dir / "batch2.ndjson")

    run_ingest_available_now(spark, str(in_dir), str(out_dir), str(ckpt))
    got = spark.read.parquet(str(out_dir))
    assert got.count() == 30
    assert got.select("bizId").distinct().count() == 30

    # restart with new + already-seen input: only the 5 new survive
    write_ndjson(rows[:5], in_dir / "batch3.ndjson")  # dup file content, new filename
    write_ndjson(make_results(40, seed=6)[30:], in_dir / "batch4.ndjson")  # hm: ids overlap seed
    run_ingest_available_now(spark, str(in_dir), str(out_dir), str(ckpt))
    got2 = spark.read.parquet(str(out_dir))
    assert got2.select("bizId").distinct().count() == got2.count()
    assert got2.count() >= 30


def test_tumbling_window_streaming_matches_batch(spark, tmp_path, sf_dir):
    """The window() expression plans identically in batch and streaming;
    feed the same events through a file stream and compare."""
    from yelp_data_engineering_pipeline_spark.tables import load

    events = load(spark, sf_dir, "events")
    batch_result = {
        (r["win_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in tumbling_agg(events).collect()
    }

    in_dir = tmp_path / "ev"
    in_dir.mkdir()
    with (in_dir / "events.ndjson").open("w") as f:
        for r in events.collect():
            f.write(
                json.dumps(
                    {
                        "event_id": r["event_id"],
                        "ts": r["ts"].isoformat(sep=" "),
                        "user_id": r["user_id"],
                        "event_type": r["event_type"],
                        "value": r["value"],
                    }
                )
                + "\n"
            )

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .json(str(in_dir))
        .withWatermark("ts", "1 hour")
    )
    q = (
        tumbling_agg(stream)
        .writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_result = {
        (r["win_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    assert stream_result == batch_result


def test_stateful_running_stats(spark, tmp_path, sf_dir):
    """applyInPandasWithState: running per-user stats across two
    micro-batches accumulate (state survives between triggers)."""
    from yelp_data_engineering_pipeline_spark.streaming.stateful import running_user_stats
    from yelp_data_engineering_pipeline_spark.tables import load

    events = load(spark, sf_dir, "events").select("user_id", "value")
    expected = {
        r["user_id"]: (r["n"], round(r["s"], 2))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }

    in_dir = tmp_path / "sin"
    in_dir.mkdir()
    rows = events.collect()
    half = len(rows) // 2
    for name, chunk in [("a.ndjson", rows[:half]), ("b.ndjson", rows[half:])]:
        with (in_dir / name).open("w") as f:
            for r in chunk:
                f.write(json.dumps({"user_id": r["user_id"], "value": r["value"]}) + "\n")

    stream = spark.readStream.schema("user_id long, value double").option(
        "maxFilesPerTrigger", "1"
    ).json(str(in_dir))
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("stateful_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode memory sink holds one row per (user, batch); n_events
    # is monotone, so the max row per user is the final state
    final = {}
    for r in spark.sql("SELECT * FROM stateful_test").collect():
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], round(r["total_value"], 2))
    assert final == expected


def test_dedup_within_watermark(spark, tmp_path):
    """Continuous-pipeline dedup variant: dropDuplicatesWithinWatermark
    bounds state by the late-data horizon instead of full key
    cardinality (ingest.py dedup_stream(watermark=...))."""
    from yelp_data_engineering_pipeline_spark.streaming.ingest import (
        dedup_stream,
        read_results_stream,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = make_results(20, seed=9)
    write_ndjson(rows + rows[:7], in_dir / "b1.ndjson")  # 7 in-stream dups

    stream = dedup_stream(read_results_stream(spark, str(in_dir)), watermark="10 minutes")
    q = (
        stream.writeStream.format("memory")
        .queryName("wmdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT bizId FROM wmdedup")
    assert got.count() == 20
    assert got.distinct().count() == 20
