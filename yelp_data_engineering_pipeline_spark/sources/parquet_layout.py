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


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    n_shards: int = 16,
    max_records_per_file: int | None = None,
) -> None:
    """Deterministic sharded export for training pipelines.

    - shard id = md5(key) % n_shards (operators/preptext.py
      ``shard_assignment``) — re-exports produce byte-identical shard
      membership, so trainer resume points survive a rewrite;
    - ``repartition(n_shards, shard)`` routes each shard to one task
      BEFORE the partitioned write — without it every task appends to
      every shard directory (tasks × shards small files);
    - ``maxRecordsPerFile`` bounds file sizes for streaming loaders.
    """
    from ..operators.preptext import shard_assignment

    sharded = df.withColumn(
        "shard", shard_assignment(F.col(key_col).cast("string"), n_shards)
    )
    writer = (
        sharded.repartition(n_shards, F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(out_dir)


def read_training_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read a sharded export back; ``shard`` returns as a partition
    column (filterable with directory pruning)."""
    return spark.read.parquet(out_dir)
