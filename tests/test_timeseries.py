"""Unit + plan tests for gap fill/LOCF, interval-overlap join, and
bigram collocations (operators/timeseries.py, asof.py, collocations.py)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from yelp_data_engineering_pipeline_spark.operators.asof import interval_overlap_join
from yelp_data_engineering_pipeline_spark.operators.collocations import bigram_lift
from yelp_data_engineering_pipeline_spark.operators.timeseries import gapfill_locf


def test_gapfill_locf_fills_and_carries(spark):
    agg = spark.createDataFrame(
        [("a", 10, 5), ("a", 13, 7), ("b", 2, 1)],
        "k string, b long, v long",
    )
    out = gapfill_locf(agg, "k", "b", ["v"]).orderBy("k", "b").collect()
    a_rows = [(r.b, r.v, r.v_locf) for r in out if r.k == "a"]
    # buckets 11 and 12 are generated, v stays NULL, v_locf carries 5
    assert a_rows == [(10, 5, 5), (11, None, 5), (12, None, 5), (13, 7, 7)]
    b_rows = [(r.b, r.v_locf) for r in out if r.k == "b"]
    assert b_rows == [(2, 1)]


def test_gapfill_window_is_key_partitioned(spark):
    agg = spark.createDataFrame([("a", 1, 1)], "k string, b long, v long")
    plan = gapfill_locf(agg, "k", "b", ["v"])._jdf.queryExecution().executedPlan().toString()
    # the LOCF window must carry a partition spec (no single-partition stage)
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert re.search(r"windowspecdefinition\(k#", line), line


def test_interval_overlap_join_exact_pairs(spark):
    left = spark.createDataFrame(
        [(1, 0, 100), (2, 5000, 5100), (3, 9000, 9050)], "id long, s long, e long"
    )
    right = spark.createDataFrame(
        [(10, 50, 60), (20, 99, 200), (30, 4000, 5500), (40, 20000, 20010)],
        "id long, s long, e long",
    )
    pairs = {
        (r.l_id, r.r_id)
        for r in interval_overlap_join(left, right).select("l_id", "r_id").collect()
    }
    # interval 1 overlaps 10 and 20; 2 overlaps 30; 3 overlaps nothing
    assert pairs == {(1, 10), (1, 20), (2, 30)}


def test_interval_overlap_join_no_cartesian(spark):
    df = spark.createDataFrame([(1, 0, 10)], "id long, s long, e long")
    plan = interval_overlap_join(df, df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_overlap_counts_pair_once_across_buckets(spark):
    # both intervals span many buckets and overlap in several — the
    # greatest-start dedup must count the pair exactly once
    left = spark.createDataFrame([(1, 0, 40000)], "id long, s long, e long")
    right = spark.createDataFrame([(2, 3500, 39000)], "id long, s long, e long")
    assert interval_overlap_join(left, right).count() == 1


def test_bigram_lift_counts(spark):
    docs = spark.createDataFrame(
        [("spark shuffle spark shuffle",), ("spark join",)], "text string"
    )
    rows = {r.bg: r for r in bigram_lift(docs).collect()}
    # unigrams: spark x3, shuffle x2, join x1 (M=6); bigrams: N=4
    assert rows["spark shuffle"].cxy == 2
    assert rows["spark shuffle"].cx == 3 and rows["spark shuffle"].cy == 2
    # lift = floor(2*6*6*1000 / (4*3*2)) = 3000
    assert rows["spark shuffle"].lift_milli == 3000
    assert rows["shuffle spark"].cxy == 1
    assert rows["spark join"].lift_milli == 3000  # 1*36*1000/(4*3*1)


def test_asof_join_duplicate_ts_max_value_wins(spark):
    """Documented contract (asof.py): right rows sharing a timestamp
    resolve by max value in backward direction — deterministically,
    regardless of shuffle order. Locked by a divergent-tie fixture (the
    driver fixture has no such ties, ADVICE r5)."""
    from yelp_data_engineering_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100, 1)], "k long, ts long, lid long")
    right = spark.createDataFrame(
        [(1, 50, 3.0), (1, 50, 9.0), (1, 50, 7.0)], "k long, ts long, val double"
    )
    rows = asof_join(left, right, on="ts", by="k", value_cols=["val"]).collect()
    assert len(rows) == 1 and rows[0].val_asof == 9.0


def test_asof_join_null_valued_nearest_row_yields_null(spark):
    """pandas-merge_asof parity for NULL-valued right rows: the match
    payload travels as ONE struct, so a NULL value on the nearest row
    comes back as NULL — never the value of an OLDER row (ADVICE r5,
    asof.py:94)."""
    from yelp_data_engineering_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100, 1)], "k long, ts long, lid long")
    right = spark.createDataFrame(
        [(1, 10, 5.0), (1, 90, None)], "k long, ts long, val double"
    )
    rows = asof_join(left, right, on="ts", by="k", value_cols=["val"]).collect()
    # nearest right row is ts=90 whose value is NULL → NULL, not 5.0
    assert len(rows) == 1 and rows[0].val_asof is None

    # and with a tolerance that only covers the nearest row, the gap is
    # measured against that same row (not the older valued one)
    rows = asof_join(
        left, right, on="ts", by="k", value_cols=["val"], tolerance_us=20
    ).collect()
    assert len(rows) == 1 and rows[0].val_asof is None


def test_asof_nearest_null_valued_row_yields_null(spark):
    from yelp_data_engineering_pipeline_spark.operators.asof import asof_nearest_join

    left = spark.createDataFrame([(1, 100, 1)], "k long, ts long, lid long")
    right = spark.createDataFrame(
        [(1, 10, 5.0), (1, 90, None)], "k long, ts long, val double"
    )
    rows = asof_nearest_join(left, right, on="ts", by="k", value_col="val").collect()
    assert len(rows) == 1 and rows[0].val_asof is None and rows[0].gap_us == 10


def test_ema_half_generic_schema(spark):
    """ema_half derives its output schema from the input (ADVICE r5:
    previously hardcoded to the events-table column names/types)."""
    from yelp_data_engineering_pipeline_spark.operators.timeseries import ema_half

    df = spark.createDataFrame(
        [("a", 1, 4), ("a", 2, 8)], "grp string, seq int, reading int"
    )
    out = ema_half(df, "grp", ("seq",), "reading")
    assert [f.name for f in out.schema.fields] == ["grp", "seq", "reading", "ema"]
    got = {r.seq: r.ema for r in out.collect()}
    assert got == {1: 4.0, 2: 6.0}


def test_ohlc_floor_division_negative_ts(spark):
    """Bucket uses integer floor division (`div`), not truncating
    double-division cast: pre-1970 (negative) timestamps must land in
    the floor bucket like the DuckDB `//` oracle (ADVICE r5)."""
    from yelp_data_engineering_pipeline_spark.operators.timeseries import ohlc

    df = spark.createDataFrame(
        [("x", -1, 1, 100), ("x", 1, 2, 200)], "k string, ts_us long, tie long, v long"
    )
    out = ohlc(df, "k", "ts_us", "tie", F.col("v"), bucket_us=10).collect()
    assert [(r.bucket, r.open_c, r.close_c) for r in out] == [(-1, 100, 100), (0, 200, 200)]


def test_ema_half_matches_pandas_ewm(spark):
    """The hand-rolled recurrence must equal pandas' own
    ewm(alpha=0.5, adjust=False) — an independent implementation of
    y_k = (1-a)y_{k-1} + a·x_k, bit-for-bit (both round once per step
    because halving is exact)."""
    import pandas as pd

    from yelp_data_engineering_pipeline_spark.operators.timeseries import ema_half

    rows = [(1, i, i * 10, float(v)) for i, v in enumerate([3.3, 1.1, 7.7, 2.2, 9.9])]
    rows += [(2, 10 + i, i * 10, float(v)) for i, v in enumerate([5.5, 5.5, 0.1])]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts_us long, value double")
    got = {
        (r.user_id, r.event_id): r.ema
        for r in ema_half(df, "user_id", ("ts_us", "event_id"), "value").collect()
    }
    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "ts_us", "value"])
    for uid, g in pdf.sort_values(["ts_us", "event_id"]).groupby("user_id"):
        ref = g["value"].ewm(alpha=0.5, adjust=False).mean()
        for eid, want in zip(g["event_id"], ref):
            assert got[(uid, eid)] == want  # exact equality, not approx
