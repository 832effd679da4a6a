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
