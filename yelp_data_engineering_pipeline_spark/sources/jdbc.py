"""JDBC source/sink (SURVEY.md §2.1 S7/S8).

The reference stores into Postgres via per-row ORM inserts inside one
transaction (parse_and_upload_to_db.py:84-183). The Spark-native
equivalent is the JDBC batch writer; the engine's *native* store is
parquet (plans/normalize.write_star_schema) and JDBC is the drop-in
alternative behind the same dict-of-DataFrames interface.

The container runs no Postgres, but Spark's bundled embedded Derby
gives the wrappers a REAL round-trip test (tests/test_ingest.py::
test_jdbc_roundtrip_embedded_derby); options mirror the reference's
asyncpg DSN (base/connect.py:5-21).

Scale notes: ``numPartitions``+``partitionColumn`` bound parallel read
fan-in; writes use rewriteBatchedInserts-style batching sized by
``batchsize``. A single huge unpartitioned JDBC read is a driver-side
bottleneck — always pass bounds for fact-scale tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_url(host: str, port: int, database: str) -> str:
    return f"jdbc:postgresql://{host}:{port}/{database}"


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    user: str,
    password: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    driver: str = "org.postgresql.Driver",
):
    """S8: partitioned JDBC scan."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    *,
    mode: str = "append",
    batch_size: int = 10_000,
    driver: str = "org.postgresql.Driver",
) -> None:
    """S7: batched JDBC sink (the set-oriented replacement for the
    reference's per-row ORM inserts)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("batchsize", str(batch_size))
        .mode(mode)
        .save()
    )
