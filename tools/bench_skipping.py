"""Measure the zone-map data-skipping win on the MERGE table.

Builds a ParquetMergeTable from the x10 star tier's lineitem (6M rows,
/tmp/stressx10 — tools/make_stress.py), OPTIMIZE-ZORDERs it on
(l_orderkey, l_partkey), then times a narrow range probe on EACH of the
two z columns through (a) read_where() — driver-side file pruning from
_STATS.json — and (b) the same predicate over the full read(). Both
paths return identical rows (asserted); the delta is pure scan cost.
Prints one JSON line.

    python tools/bench_skipping.py [tier_dir] [table_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    tier = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stressx10"
    root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/skiptable"
    if not os.path.exists(os.path.join(tier, "lineitem.parquet")):
        sys.exit(f"{tier}/lineitem.parquet missing — run tools/make_stress.py")

    from pyspark.sql import functions as F

    from yelp_data_engineering_pipeline_spark.operators.upsert import (
        ParquetMergeTable,
    )
    from yelp_data_engineering_pipeline_spark.session import get_spark

    spark = get_spark("bench-skipping")
    shutil.rmtree(root, ignore_errors=True)
    t = ParquetMergeTable(spark, root, key="rk")

    li = (
        spark.read.parquet(os.path.join(tier, "lineitem.parquet"))
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
        .withColumn("rk", F.monotonically_increasing_id())
    )
    t0 = time.perf_counter()
    t.merge(li)
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    t.compact(target_files=64, zorder_by=("l_orderkey", "l_partkey"))
    t_zorder = time.perf_counter() - t0
    n_files = len(t.read().inputFiles())

    out: dict = {
        "metric": "merge_table_zone_map_skipping",
        "tier": tier,
        "rows": t.read().count(),
        "n_files": n_files,
        "build_sec": round(t_build, 3),
        "zorder_sec": round(t_zorder, 3),
        "probes": {},
    }
    # probe the middle 1% of each key's actual domain (tier-agnostic)
    b = t.read().agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).first()
    domains = {"l_orderkey": (b[0], b[1]), "l_partkey": (b[2], b[3])}
    probes = []
    for col, (dlo, dhi) in domains.items():
        mid, width = (dlo + dhi) // 2, max((dhi - dlo) // 100, 1)
        probes.append((col, mid, mid + width))
    for col, lo, hi in probes:
        pruned = t.read_where({col: (lo, hi)})
        full = t.read().filter(F.col(col).between(lo, hi))
        t0 = time.perf_counter()
        n_pruned = pruned.count()
        s_pruned = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_full = full.count()
        s_full = time.perf_counter() - t0
        assert n_pruned == n_full, (col, n_pruned, n_full)
        out["probes"][col] = {
            "rows": n_pruned,
            "files_read": len(pruned.inputFiles()),
            "files_total": n_files,
            "skip_sec": round(s_pruned, 3),
            "full_sec": round(s_full, 3),
            "speedup": round(s_full / max(s_pruned, 1e-9), 2),
        }
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
