"""Columnar / delimited file formats beyond the reference's NDJSON:
schema-first CSV and ORC round-trips (the parquet path lives in
tables.py / layout.py).

The reference only speaks NDJSON + Postgres; a drop-in replacement
engine still needs the boring interchange formats. Same rules as
ndjson.py: explicit schemas always (at 100 TB an inference pass is a
full extra scan), header handling pinned, and the file-sink commit
protocol provides per-task atomicity.

CSV caveats encoded here rather than left to defaults:
- ``mode="FAILFAST"`` — silent row-dropping (DROPMALFORMED) or null
  smearing (PERMISSIVE) hides corruption at scale; fail loudly.
- explicit ``nullValue`` (``\\N``) so NULL round-trips unambiguously.
  Empty string does NOT survive a CSV round-trip (Spark's reader folds
  quoted-empty into null — a format limitation, asserted in the tests
  so a behavior change is caught); use ORC/parquet where '' vs NULL
  matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(spark: SparkSession, path: str, schema: StructType, header: bool = True) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "FAILFAST")
        .option("nullValue", "\\N")
        .option("emptyValue", "")
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("nullValue", "\\N")
        .option("emptyValue", "")
        .csv(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_xml(
    spark: SparkSession, path: str, row_tag: str, schema: StructType | None = None
) -> DataFrame:
    """Schema-first XML scan (native in Spark 4 — the spark-xml package
    was merged into core). ``rowTag`` splits the document into rows, so
    a multi-GB XML dump parallelizes by row boundary like any text
    source; entity unescaping (&amp; etc.) happens in the parser, not in
    downstream expressions. Pass ``schema`` in production — inference is
    a full extra scan, same rule as CSV."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(df: DataFrame, path: str, root_tag: str, row_tag: str) -> None:
    (
        df.write.format("xml")
        .option("rootTag", root_tag)
        .option("rowTag", row_tag)
        .mode("overwrite")
        .save(path)
    )
