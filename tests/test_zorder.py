from __future__ import annotations

from pyspark.sql import functions as F

from yelp_data_engineering_pipeline_spark.operators.zorder import zorder_layout, zvalue


def _py_z(x: int, y: int, bits: int = 16) -> int:
    x, y = x % (1 << bits), y % (1 << bits)
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zvalue_matches_reference_interleave(spark):
    pts = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (70000, 123)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r["x"], r["y"]): r["z"] for r in df.select("x", "y", zvalue(F.col("x"), F.col("y")).alias("z")).collect()}
    for x, y in pts:
        assert got[(x, y)] == _py_z(x, y), (x, y)


def test_zorder_layout_bounds_both_dims(spark):
    # a 64x64 grid: after z-layout into 16 range partitions, every
    # partition's bounding box must be far smaller than the full grid
    # in BOTH dimensions (single-column sort would leave one dim full-span)
    grid = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], "x long, y long"
    )
    laid = zorder_layout(grid, "x", "y", n_files=16).withColumn(
        "pid", F.spark_partition_id()
    )
    boxes = (
        laid.groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("span_x"),
            (F.max("y") - F.min("y")).alias("span_y"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") > 0)
        .collect()
    )
    assert len(boxes) > 4
    for r in boxes:
        assert r["span_x"] <= 32, r
        assert r["span_y"] <= 32, r
