"""Unit tests for hours parsing — cases lifted from the reference's
docstring examples (parse_and_upload_to_db.py:63-69) plus the FIXTURES
A2 matrix."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelp_data_engineering_pipeline_spark.functions.hours import (
    OPEN_24H_CLOSE,
    hours_ranges,
    time_to_seconds,
)


def _parse(spark, s):
    row = spark.range(1).select(hours_ranges(F.lit(s)).alias("r")).first()
    if row["r"] is None:
        return None
    return [(x["open_time"], x["close_time"]) for x in row["r"]]


def test_simple_range(spark):
    assert _parse(spark, "11:00 AM - 3:00 PM") == [(11 * 3600, 15 * 3600)]


def test_split_shift(spark):
    assert _parse(spark, "11:00 AM - 3:00 PM4:30 PM - 10:00 PM") == [
        (11 * 3600, 15 * 3600),
        (16 * 3600 + 1800, 22 * 3600),
    ]


def test_closed(spark):
    assert _parse(spark, "Closed") == []


def test_open_24_hours(spark):
    assert _parse(spark, "Open 24 hours") == [(0, OPEN_24H_CLOSE)]


def test_overnight_next_day(spark):
    # close < open preserved; "(Next day)" marker stripped
    assert _parse(spark, "5:00 PM - 1:00 AM (Next day)") == [(17 * 3600, 1 * 3600)]


def test_hour_only_fallback(spark):
    # the reference's parse_time fallback ("%I %p"); its range regex
    # would reject this — documented extension
    assert _parse(spark, "11 AM - 9 PM") == [(11 * 3600, 21 * 3600)]


def test_unparseable_is_null(spark):
    # reference raises ValueError and aborts the batch; we quarantine
    assert _parse(spark, "see website") is None
    assert _parse(spark, "") is None


def test_midnight_noon_edges(spark):
    assert _parse(spark, "12:00 AM - 12:00 PM") == [(0, 12 * 3600)]


def test_time_to_seconds_fallback(spark):
    rows = (
        spark.createDataFrame([("11:30 PM",), ("7 AM",), ("nope",)], ["t"])
        .select(time_to_seconds(F.col("t")).alias("s"))
        .collect()
    )
    assert [r["s"] for r in rows] == [23 * 3600 + 1800, 7 * 3600, None]
