from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from yelp_data_engineering_pipeline_spark.sources.filefmt import (
    read_csv,
    read_orc,
    write_csv,
    write_orc,
)

_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
    ]
)


def _frame(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (3, "", None), (4, "d,e", 4.0)],
        _SCHEMA,
    )


def test_csv_round_trip(spark, tmp_path):
    df = _frame(spark)
    p = str(tmp_path / "csv")
    write_csv(df, p)
    back = read_csv(spark, p, _SCHEMA)
    # the delimiter inside "d,e" survives quoting; NULL round-trips via \N
    assert back.filter("id = 4").collect()[0]["name"] == "d,e"
    assert back.filter("id = 2").collect()[0]["name"] is None
    # documented CSV limitation: empty string folds into NULL on read
    # (if this assert ever flips, update filefmt.py's docstring)
    assert back.filter("id = 3").collect()[0]["name"] is None
    assert back.count() == df.count()


def test_orc_round_trip(spark, tmp_path):
    df = _frame(spark)
    p = str(tmp_path / "orc")
    write_orc(df, p)
    back = read_orc(spark, p)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_orc_predicate_pushdown_reaches_scan(spark, tmp_path):
    p = str(tmp_path / "orc2")
    write_orc(_frame(spark), p)
    plan = (
        read_orc(spark, p)
        .filter(F.col("id") > 2)
        .select("id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "id" in plan


def test_training_shards_roundtrip_deterministic(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from yelp_data_engineering_pipeline_spark.operators.preptext import shard_assignment
    from yelp_data_engineering_pipeline_spark.sources.parquet_layout import (
        read_training_shards,
        write_training_shards,
    )
    from yelp_data_engineering_pipeline_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, "doc_id", n_shards=8, max_records_per_file=10)

    back = read_training_shards(spark, out)
    assert back.count() == docs.count()
    # shard column is a directory partition → pruning applies
    assert [f.name for f in (tmp_path / "shards").iterdir() if f.name.startswith("shard=")]
    # membership is the md5 assignment, not whatever task wrote the row
    expected = docs.select(
        "doc_id", shard_assignment(F.col("doc_id").cast("string"), 8).alias("shard")
    )
    got = back.select("doc_id", F.col("shard").cast("int").alias("shard"))
    assert got.exceptAll(expected).count() == 0 and expected.exceptAll(got).count() == 0
    # maxRecordsPerFile bounds every data file
    import pyarrow.parquet as pq

    for f in (tmp_path / "shards").rglob("*.parquet"):
        assert pq.ParquetFile(f).metadata.num_rows <= 10


def test_training_shards_one_task_per_shard(spark, sf_dir, tmp_path):
    # repartition(n, shard) → each shard dir holds few files, not one
    # per input task (the small-file explosion the writer guards against)
    from yelp_data_engineering_pipeline_spark.sources.parquet_layout import (
        write_training_shards,
    )
    from yelp_data_engineering_pipeline_spark.tables import load

    docs = load(spark, sf_dir, "documents").repartition(16)
    out = str(tmp_path / "s2")
    write_training_shards(docs, out, "doc_id", n_shards=4)
    for d in (tmp_path / "s2").iterdir():
        if d.name.startswith("shard="):
            files = [f for f in d.iterdir() if f.suffix == ".parquet"]
            assert len(files) == 1, f"{d.name}: {len(files)} files"


def test_xml_round_trip_with_entities(spark, tmp_path):
    """Native Spark 4 XML source: rowTag row-splitting, entity escaping
    round-trips markup-significant characters, explicit schema on read."""
    from yelp_data_engineering_pipeline_spark.sources.filefmt import read_xml, write_xml

    df = spark.createDataFrame(
        [(1, "Cafe & Co <deluxe>", 4.5), (2, None, 3.0), (3, "Diner", None)],
        _SCHEMA,
    )
    p = str(tmp_path / "xml")
    write_xml(df, p, root_tag="rows", row_tag="row")
    back = read_xml(spark, p, row_tag="row", schema=_SCHEMA)
    assert back.count() == 3
    # & and <> survive the escape/unescape round-trip byte-exactly
    assert back.filter("id = 1").collect()[0]["name"] == "Cafe & Co <deluxe>"
    assert back.filter("id = 2").collect()[0]["name"] is None


# --- timestamp-unit footer sniffing (tables._ts_long_schema) -----------------
#
# The events loader builds ONE unit→micros conversion from the parquet
# footers and applies it to the whole scan, so every file in a directory
# must agree on timestamp unit and physical type; a mixed-unit append by
# a different writer must fail loudly, not silently mis-scale by 1000×
# (ADVICE r4).


def _write_ts_file(path, unit):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "ts": pa.array([1_700_000_000_000] * 3, pa.timestamp(unit)),
            "v": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    pq.write_table(tbl, path)


def test_ts_sniff_consistent_multifile_dir(tmp_path):
    from yelp_data_engineering_pipeline_spark.tables import _ts_long_schema

    d = tmp_path / "events.parquet"
    d.mkdir()
    _write_ts_file(str(d / "part-0.parquet"), "ms")
    _write_ts_file(str(d / "part-1.parquet"), "ms")
    schema, ts_exprs = _ts_long_schema(str(d))
    assert ts_exprs == {"ts": "ts * 1000"}  # ms → micros


def test_ts_sniff_rejects_mixed_units(tmp_path):
    import pytest

    from yelp_data_engineering_pipeline_spark.tables import _ts_long_schema

    d = tmp_path / "events.parquet"
    d.mkdir()
    _write_ts_file(str(d / "part-0.parquet"), "ms")
    _write_ts_file(str(d / "part-1.parquet"), "us")
    with pytest.raises(ValueError, match="mixed parquet schemas"):
        _ts_long_schema(str(d))
