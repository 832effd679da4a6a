"""Scalar-function unit tests for the pieces without a DuckDB oracle:
JSONPath recursive descent (F14) and tz-aware conversions (F7) — each
checked against a python-stdlib oracle."""

from __future__ import annotations

import json
from datetime import datetime, timezone
from zoneinfo import ZoneInfo

from pyspark.sql import functions as F

from yelp_data_engineering_pipeline_spark.functions.jsonpath import json_descend, json_descend_py


NESTED = {
    "page": {
        "businessHighlights": ["wifi", "patio"],
        "sections": [
            {"businessHighlights": ["takeout"], "other": 1},
            {"deep": {"businessHighlights": "single"}},
        ],
    }
}


def test_json_descend_python_matches_semantics():
    hits = json_descend_py(json.dumps(NESTED), "businessHighlights")
    assert hits == [json.dumps(["wifi", "patio"]), json.dumps(["takeout"]), "single"]
    assert json_descend_py("not json", "k") is None
    assert json_descend_py(json.dumps({"a": 1}), "missing") == []


def test_json_descend_udf(spark):
    df = spark.createDataFrame([(json.dumps(NESTED),)], ["blob"])
    row = df.select(json_descend(F.col("blob"), "businessHighlights").alias("hits")).first()
    assert row["hits"] == [json.dumps(["wifi", "patio"]), json.dumps(["takeout"]), "single"]


def test_tz_conversion_matches_zoneinfo(spark, sf_dir):
    """F7: convert_timezone UTC→America/Los_Angeles vs python zoneinfo
    (covers a DST boundary implicitly via the events ts range)."""
    from yelp_data_engineering_pipeline_spark.tables import load

    ev = load(spark, sf_dir, "events").limit(50)
    got = ev.select(
        "event_id",
        "ts",
        F.convert_timezone(F.lit("UTC"), F.lit("America/Los_Angeles"), F.col("ts")).alias("la_ts"),
    ).collect()
    la = ZoneInfo("America/Los_Angeles")
    for r in got:
        # collect() returns TimestampType naive in the driver's SYSTEM
        # zone — anchor it there (astimezone on a naive datetime), NOT
        # as UTC wall, or the expectation shifts on a non-UTC host
        # (bit the r12 full-suite run under TZ=America/New_York)
        expected = r["ts"].astimezone(la).replace(tzinfo=None)
        assert r["la_ts"] == expected, r["event_id"]


def test_weekday_name_of_now_parameterized(spark):
    """F6/F7: weekday-of-now uses a parameterized instant, never
    wall-clock (SURVEY §7 hard point 3)."""
    from yelp_data_engineering_pipeline_spark.plans.yelp_queries import resolve_now

    la = ZoneInfo("America/Los_Angeles")
    now = datetime(2026, 1, 4, 23, 30, tzinfo=la)  # Sunday local
    secs, today, prev = resolve_now(now)
    assert (today, prev) == ("Sun", "Sat")
    assert secs == 23 * 3600 + 30 * 60


def test_offset_and_keyset_pagination_agree(spark, sf_dir):
    """W1: both pagination formulations return the same page — offset
    (row_number, driver-bound pages) and keyset (seek + top-k, the
    100 TB path used by the catalog entry)."""
    from yelp_data_engineering_pipeline_spark.operators.pagination import (
        paginate,
        paginate_keyset,
    )
    from yelp_data_engineering_pipeline_spark.tables import load

    import pyspark.sql.functions as F

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    off_page = sorted(
        r["o_orderkey"] for r in paginate(orders, ["o_orderkey"], page=3, page_size=10).collect()
    )
    boundary = (
        orders.select("o_orderkey").orderBy("o_orderkey").limit(20)
        .agg(F.max("o_orderkey").alias("k")).collect()[0]["k"]
    )
    key_page = sorted(
        r["o_orderkey"]
        for r in paginate_keyset(orders, "o_orderkey", 10, after_key=boundary).collect()
    )
    assert off_page == key_page and len(off_page) == 10


def test_json_descend_pandas_udf_parity_and_arrow_plan(spark):
    """VERDICT r9 next-6: the $.. descent is now an Arrow-batched
    pandas_udf. Parity: the new path must return exactly what the old
    row-at-a-time F.udf returned over an apollo-state-shaped fixture
    (nested dicts, lists, nulls, malformed JSON); plan: the UDF stage
    must be ArrowEvalPython, never BatchEvalPython."""
    from pyspark.sql.types import ArrayType, StringType

    apollo = {
        "business": {
            "name": "Restaurant biz-x",
            "openHours": [
                {"weekday": "Mon", "hours": "11:00 AM - 3:00 PM"},
                {"weekday": "Sat", "hours": "5:00 PM - 1:00 AM (Next day)"},
            ],
            "sections": [{"openHours": "closed"}, {"deep": {"openHours": 7}}],
        }
    }
    rows = [(json.dumps(apollo),), (json.dumps(NESTED),),
            ("not json",), (None,), (json.dumps({"a": 1}),)]
    df = spark.createDataFrame(rows, ["blob"])

    old_udf = F.udf(json_descend_py, ArrayType(StringType()))
    for key in ("openHours", "businessHighlights", "missing"):
        got = [r["h"] for r in
               df.select(json_descend(F.col("blob"), key).alias("h")).collect()]
        want = [r["h"] for r in
                df.select(old_udf(F.col("blob"), F.lit(key)).alias("h")).collect()]
        assert got == want, key

    plan = df.select(json_descend(F.col("blob"), "openHours"))._jdf \
        .queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
