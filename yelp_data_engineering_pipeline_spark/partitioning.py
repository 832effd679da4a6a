"""Input-split widening for CPU-bound narrow pipelines.

A narrow (no-shuffle) stage runs one task per input split. Catalyst
sizes parquet splits by bytes (``spark.sql.files.maxPartitionBytes``),
which is right for IO-bound scans but wrong for compute-heavy
expression pipelines over SMALL inputs: a 1.5 MB documents file arrives
as ONE split, so a shingle→md5→minhash pipeline (or 512-term hyperplane
dots, or per-token regex stacks) serializes on one core regardless of
cluster size. Measured on this repo's bench: the MinHash signature
build dropped 4.4 s → 1.35 s at sf0.1/local[32] from widening alone.

At 100 TB inputs naturally carry thousands of splits and this helper is
a no-op — it only guards the small-input/large-cluster corner (and the
benchmark tiers), at the cost of one tiny round-robin shuffle when it
fires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_for_compute(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism when
    its plan currently yields fewer splits. No-op (returns ``df``
    unchanged, no shuffle added) when the input is already wide enough."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
