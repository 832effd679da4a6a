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

The current width is ESTIMATED from file metadata and the (unexecuted)
physical plan, never via ``df.rdd.getNumPartitions()``: under AQE,
``.rdd`` on a post-shuffle frame materializes EVERY upstream query
stage eagerly — plan-construction time then executes the whole
upstream pipeline before the real action runs (measured: the
dedup-cascade tier-2 subtree, 8 jobs and 1.4–5.5 s, ran inside
``minhash_lsh_pairs``'s widen call) — and even on a bare scan the
``toRdd`` conversion pays full query planning (~1 s first call).
"""

from __future__ import annotations

import os
import re
from urllib.parse import urlparse

from pyspark.sql import DataFrame

# Split sizing for COMPUTE-bound stages: ~32 KB of input per task keeps
# every core busy on expression-heavy pipelines without shredding tiny
# inputs into no-op tasks (the IO default, 128 MB, is 4096x coarser).
_COMPUTE_BYTES_PER_SPLIT = 32 * 1024

# Markers of a shuffle in the (unexecuted) physical-plan string. NOT
# "BroadcastExchange": a broadcast join leaves the probe side's scan
# width intact, so such frames stay on the scan estimator.
_SHUFFLE_MARKERS = (
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "Exchange RoundRobinPartitioning",
    "Exchange SinglePartition",
)

_SIZE_SUFFIX = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30}


def _conf_bytes(spark, key: str, default: int) -> int:
    """Parse a Spark size conf ("134217728", "128m", "64MB") to bytes."""
    try:
        raw = str(spark.conf.get(key)).strip().lower()
    except Exception:
        return default
    m = re.fullmatch(r"(\d+)\s*([kmg]?)b?", raw)
    if not m:
        return default
    return int(m.group(1)) * _SIZE_SUFFIX.get(m.group(2) or "b", 1)


def _local_input_bytes(df: DataFrame) -> list[int] | None:
    """Sizes of the frame's local input files (metadata only, lazy even
    under joins), or None when unknowable (non-file / remote source)."""
    try:
        sizes = [
            os.path.getsize(urlparse(f).path)
            for f in df.inputFiles()
            if f.startswith("file:")
        ]
    except Exception:
        return None
    return sizes or None


def estimated_width(df: DataFrame, sizes: list[int] | None = None) -> int | None:
    """The partition count ``df`` will (roughly) execute with, WITHOUT
    executing anything — the safe replacement for
    ``df.rdd.getNumPartitions()`` (see module docstring).

    - Post-shuffle frames: AQE coalesces the final exchange by size
      (``advisoryPartitionSizeInBytes``); the input-file bytes bound
      the data, so ``bytes / advisory`` estimates the width. Unknown
      bytes → None (caller decides; every production frame here roots
      in parquet, so this is the in-memory-test corner).
    - Narrow scans: Spark's own split packing
      (``maxSplitBytes = min(maxPartitionBytes, max(openCost,
      totalWithOpenCost / defaultParallelism))``).
    - No sizes and no shuffle (LocalRelation tests): fall back to
      ``df.rdd.getNumPartitions()`` — lazy there (no query stages).

    Estimates only steer the widen/no-op decision; results never
    depend on them.
    """
    spark = df.sparkSession
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        plan = None
    if sizes is None:
        sizes = _local_input_bytes(df)
    total = sum(sizes) if sizes else None
    if plan is None:
        # can't see the plan: only .rdd knows, and only sized frames
        # are provably narrow — stay conservative
        return None
    if any(m in plan for m in _SHUFFLE_MARKERS):
        if total is None:
            return None
        advisory = _conf_bytes(
            spark, "spark.sql.adaptive.advisoryPartitionSizeInBytes", 64 << 20
        )
        return max(1, total // max(1, advisory))
    if total is not None and sizes:
        max_pb = _conf_bytes(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
        open_cost = _conf_bytes(spark, "spark.sql.files.openCostInBytes", 4 << 20)
        par = max(1, spark.sparkContext.defaultParallelism)
        padded = total + open_cost * len(sizes)
        max_split = min(max_pb, max(open_cost, padded // par))
        return max(1, -(-padded // max(1, max_split)))  # ceil div
    # LocalRelation / no files, narrow plan: toRdd is lazy here
    try:
        return df.rdd.getNumPartitions()
    except Exception:
        return None


def widen_for_compute(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to min(default parallelism, input_bytes /
    32 KB) when its estimated width is lower. Size-aware so a 150 KB
    input gets ~4 tasks (32 would be pure scheduling overhead —
    measured 2x slower at sf0.01) while a 1.5 MB input gets the full
    width (measured 3x faster at sf0.1). No-op when already wide enough
    or when input sizes are unknowable at scale."""
    target = min_partitions
    sizes = _local_input_bytes(df)
    if target is None:
        target = df.sparkSession.sparkContext.defaultParallelism
        if sizes:
            target = min(target, max(1, sum(sizes) // _COMPUTE_BYTES_PER_SPLIT))
    if target <= 1:
        return df
    cur = estimated_width(df, sizes)
    if cur is not None and cur >= target:
        return df
    if cur is None and (not sizes or sum(sizes) > (64 << 20)):
        # unknown width AND not provably small: widening could be a
        # blind full shuffle at scale — leave it alone (no production
        # caller lands here; every operator roots in parquet)
        return df
    return df.repartition(int(target))
