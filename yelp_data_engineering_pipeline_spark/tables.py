"""Loaders for the driver's synthetic star schema (TESTDATA.md).

Explicit column expectations live here so every query in the catalog
reads through one audited scan path. Parquet carries its own schema, so
no inference risk; we still centralize names to catch drift early.

Scale notes: these are plain ``spark.read.parquet`` scans — Catalyst
pushes filters and prunes columns into the parquet reader, which is the
single most important property for the 100 TB target (verified in
tests/test_plans.py by asserting PushedFilters/ReadSchema in the
formatted plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at ANY scale factor (bounded
# cardinality: 5 regions, 25 nations, 7 weekdays...).
ALWAYS_BROADCAST = {"region", "nation"}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark rejects
        # ([PARQUET_TYPE_ILLEGAL]) unless nanosAsLong is on. It is a
        # runtime-settable SQL conf, so set it HERE rather than in the
        # session factory: load() must work under ANY SparkSession,
        # including externally built ones that never saw session.py.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # immutable in some deployments; the read below may still work
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # With nanosAsLong, ts arrives as a nanos-since-epoch long; convert
        # to a micros timestamp with integer division (no double
        # round-trip: 1.7e18 ns exceeds double's 53-bit mantissa).
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so spark.sql can see them."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
