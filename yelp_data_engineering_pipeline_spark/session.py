"""SparkSession factory.

One place to encode the engine-wide execution posture:

- **AQE on** — runtime re-planning (coalesce shuffle partitions,
  skew-join splitting, dynamic broadcast) is the main lever that makes
  the same declarative plan work at sf0.001 and at 100 TB.
- **UTC session timezone** — the DuckDB oracle compares timestamps as
  UTC-naive; Spark timestamps are session-TZ (pitfall in the PySpark
  guide), so we pin UTC everywhere.
- **Arrow on** — every ``toPandas``/Pandas-UDF boundary is Arrow-batched.
- **shuffle partitions ~ cores** locally; on a real cluster this is
  overridden by the submitter (AQE coalescing makes the initial number
  much less sensitive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir(default: str = _DEFAULT_SF_DIR) -> str:
    """Testdata directory, overridable via SPARK_GRAFT_SF_DIR."""
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4)))


def get_spark(app_name: str = "yelp-pipeline-spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the session with engine defaults.

    ``shuffle_partitions`` defaults to the local core count; a cluster
    deployment should leave AQE to coalesce from a higher initial value
    (rule of thumb: 2-3x total executor cores).
    """
    cores = cpu_count()
    parts = shuffle_partitions if shuffle_partitions is not None else cores
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Pin the DEFAULT parser escape handling (ADVICE r13): the
        # SQL-text projections (operators/textrep.py _words_sql/_LINES_SQL,
        # dedup.shingles_sql) double their regex backslashes on the
        # assumption that string literals are escape-processed; with the
        # legacy escapedStringLiterals=true conf those literals would
        # change meaning. Pinning false keeps the SQL-text twins
        # equivalent to their Column forms under ANY ambient conf.
        .config("spark.sql.parser.escapedStringLiterals", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # The engine session is provisioned (8g driver below), so hinted
        # non-broadcast joins may use the faster shuffled-hash build;
        # operators consult this conf via plans.hints.nonbroadcast_hint
        # and fall back to spill-safe sort-merge under a bare session
        # that keeps Spark's default true (e.g. a 1 GiB heap at the 10x
        # stress tier, where a hash-relation build cannot get its pages).
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # NOTE: no nanosAsLong conf — tables.load reads event timestamps
        # as physical INT64 via an explicit schema (round 4), so the
        # engine no longer depends on ANY session conf for correctness.
        # Write timestamps as TIMESTAMP_MICROS, not the legacy INT96
        # default: INT96 is deprecated in the parquet spec and carries
        # NO column statistics, so INT96 snapshots defeat footer-level
        # data skipping (ParquetMergeTable zone maps + any downstream
        # reader's row-group pruning). Correctness is conf-independent —
        # under a bare session the zone-map plane just records "no
        # stats" for timestamp columns and never prunes them.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # Files: pack small test files, bound huge scans at scale.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if not SparkSession.getActiveSession():
        builder = builder.master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]"))
    return builder.getOrCreate()
