"""Fact-table parquet layout helpers: date partitioning and bucketing
(SURVEY.md §4 "partition events by date"; 100 TB posture).

- **Partition by date**: time-range predicates prune whole directories
  before any I/O (``PartitionFilters`` in the scan node — asserted in
  tests/test_plans.py). The single most important layout decision for
  an append-only event stream.
- **Bucket by join key**: pre-shuffles data at write time so repeated
  joins/aggregations on the key skip their exchange. Requires
  ``saveAsTable`` (metastore-backed); exposed here for deployments
  with a warehouse dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_events_partitioned(events: DataFrame, out_dir: str) -> None:
    """events → parquet partitioned by event_date (derived)."""
    (
        events.withColumn("event_date", F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(out_dir)
    )


def read_events_partitioned(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)


def write_bucketed_table(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 32
) -> None:
    """Bucketed + sorted managed table: co-partitions future joins on
    ``bucket_col`` (no exchange on either side when both are bucketed
    the same way)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )
