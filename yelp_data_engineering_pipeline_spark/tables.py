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


def _ts_long_schema(path: str):
    """Explicit Spark schema for a parquet file whose timestamp columns
    should arrive as RAW epoch longs, plus the per-column unit→micros
    divisor/multiplier sniffed from the footer.

    Why: the driver's events.ts has shipped as TIMESTAMP(NANOS) (which
    Spark rejects without ``nanosAsLong``) and as TIMESTAMP(MICROS)
    without isAdjustedToUTC (which Spark reads as TIMESTAMP_NTZ and any
    wall→instant cast then depends on the session timezone — a 5-hour
    skew under a non-UTC driver, caught in round 4). Reading the
    physical INT64 and converting with integer arithmetic is exact and
    timezone-free for every unit (a user-supplied LongType schema makes
    the vectorized reader hand back the raw INT64 — verified for both
    nanos and micros files)."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    if os.path.isdir(path):
        paths = sorted(glob.glob(f"{path}/*.parquet"))
    else:
        paths = [path]
    # Sniff EVERY file's footer, not just the first: the unit→micros
    # conversion built below is applied to the whole scan, so a directory
    # with mixed timestamp units (e.g. after an append by a different
    # writer) would be silently mis-scaled by 1000× (ADVICE r4). Footer
    # reads are cheap (metadata-only); fail loudly on any disagreement.
    # INT96 timestamps (Spark's own writer default) are physical
    # FIXED_LEN_BYTE_ARRAY(12) — they cannot arrive as a raw INT64, and
    # they carry instant (UTC-adjusted) semantics, so a plain Spark read
    # is already timezone-free for them. Signal the caller to fall back
    # (only if EVERY file is INT96 — a mix with INT64 cannot be read
    # consistently by either path).
    int96 = []
    arrow = None
    for p in paths:
        pq_schema = pq.ParquetFile(p).schema
        int96.append(
            any(pq_schema.column(i).physical_type == "INT96" for i in range(len(pq_schema)))
        )
        file_arrow = pq.read_schema(p)
        if arrow is None:
            arrow = file_arrow
        elif not file_arrow.equals(arrow):
            raise ValueError(
                f"mixed parquet schemas under {path!r}: {paths[0]} has {arrow} "
                f"but {p} has {file_arrow} — refusing to apply one timestamp "
                f"conversion to files with disagreeing units/types"
            )
    if all(int96):
        return None, None
    if any(int96):
        raise ValueError(
            f"mixed INT96/INT64 timestamp encodings under {path!r} — "
            f"no single read path handles both"
        )
    spark_types = {
        pa.int32(): T.IntegerType(),
        pa.int64(): T.LongType(),
        pa.float32(): T.FloatType(),
        pa.float64(): T.DoubleType(),
        pa.string(): T.StringType(),
        pa.large_string(): T.StringType(),
        pa.bool_(): T.BooleanType(),
    }
    to_micros = {"ns": "{c} div 1000", "us": "{c}", "ms": "{c} * 1000", "s": "{c} * 1000000"}
    fields, ts_exprs = [], {}
    for f in arrow:
        if pa.types.is_timestamp(f.type):
            fields.append(T.StructField(f.name, T.LongType()))
            ts_exprs[f.name] = to_micros[f.type.unit].format(c=f.name)
        elif f.type in spark_types:
            fields.append(T.StructField(f.name, spark_types[f.type]))
        else:
            raise TypeError(f"no long-schema mapping for parquet column {f.name}: {f.type}")
    return T.StructType(fields), ts_exprs


# Inferred parquet schemas, keyed on (path, file paths+mtimes+sizes).
# A bare ``spark.read.parquet(path)`` runs a schema-INFERENCE job on
# every call (~0.1 s of driver+scheduler latency) — one job per
# ``load()`` at every plan construction (r13, guide §7.3). The schema
# is pure metadata: re-reading it per call cannot change results, so
# the first load per table pays the single inference job and every
# later load passes the SAME schema explicitly (job-free planning).
# The file signature in the key drops stale entries when a tier is
# rewritten (stress fixtures); StructType is session-independent.
_SCHEMA_CACHE: dict = {}


def _file_sig(path: str) -> tuple:
    import glob
    import os

    ps = sorted(glob.glob(f"{path}/*.parquet")) if os.path.isdir(path) else [path]
    return tuple((p, os.path.getmtime(p), os.path.getsize(p)) for p in ps)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name != "events":
        path = f"{sf_dir}/{name}.parquet"
        key = (path, _file_sig(path))
        schema = _SCHEMA_CACHE.get(key)
        if schema is None:
            schema = spark.read.parquet(path).schema
            _SCHEMA_CACHE[key] = schema
        return spark.read.schema(schema).parquet(path)
    # events: timestamp column read as raw epoch INT64 and converted to
    # a micros TIMESTAMP with integer arithmetic — exact (no double
    # round-trip; 1.7e18 ns exceeds double's 53-bit mantissa) and
    # independent of parquet unit, isAdjustedToUTC, session timezone,
    # and any nanosAsLong/inferTimestampNTZ conf. Works under ANY
    # SparkSession, including externally built ones.
    from pyspark.sql import functions as F

    schema, ts_exprs = _ts_long_schema(f"{sf_dir}/{name}.parquet")
    if schema is None:  # INT96 file: instant semantics, plain read is tz-free
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")
    df = spark.read.schema(schema).parquet(f"{sf_dir}/{name}.parquet")
    for col, micros in ts_exprs.items():
        df = df.withColumn(col, F.timestamp_micros(F.expr(micros)))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so spark.sql can see them."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
