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


def _nanos_safe_schema(path: str):
    """Explicit Spark schema for a parquet file whose TIMESTAMP(NANOS)
    columns are read as raw nanos longs. A user-supplied schema bypasses
    Spark's nanos type rejection entirely (verified: the vectorized
    reader hands back the INT64), so this is the fallback when
    ``nanosAsLong`` cannot be set. Footer is sniffed with pyarrow so a
    schema change upstream doesn't break the fallback."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    if os.path.isdir(path):
        path = sorted(glob.glob(f"{path}/*.parquet"))[0]
    arrow = pq.read_schema(path)
    spark_types = {
        pa.int32(): T.IntegerType(),
        pa.int64(): T.LongType(),
        pa.float32(): T.FloatType(),
        pa.float64(): T.DoubleType(),
        pa.string(): T.StringType(),
        pa.large_string(): T.StringType(),
        pa.bool_(): T.BooleanType(),
    }
    fields = []
    for f in arrow:
        if pa.types.is_timestamp(f.type):
            fields.append(T.StructField(f.name, T.LongType()))  # raw nanos
        elif f.type in spark_types:
            fields.append(T.StructField(f.name, spark_types[f.type]))
        else:
            raise TypeError(f"no fallback mapping for parquet column {f.name}: {f.type}")
    return T.StructType(fields)


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
            pass  # immutable in some deployments; fall back to schema read
    try:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    except Exception:
        if name != "events":
            raise
        # conf could not take effect (immutable/locked deployment):
        # an explicit schema with ts as LongType reads the file anyway.
        df = spark.read.schema(_nanos_safe_schema(f"{sf_dir}/{name}.parquet")).parquet(
            f"{sf_dir}/{name}.parquet"
        )
    if name == "events":
        # With nanosAsLong, ts arrives as a nanos-since-epoch long; convert
        # to a micros timestamp with integer division (no double
        # round-trip: 1.7e18 ns exceeds double's 53-bit mantissa).
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
            # Parquet written without isAdjustedToUTC (e.g. DuckDB, some
            # writers) loads as TIMESTAMP_NTZ, which unix_micros() and
            # window() reject. Interpret the wall time in the session tz
            # (the engine standardizes on UTC sessions); the driver's own
            # files are NANOS and never take this branch.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so spark.sql can see them."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
