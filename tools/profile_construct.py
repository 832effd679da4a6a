"""Split each bench-surface query's wall time into PLAN CONSTRUCTION
(driver-side: py4j chatter, eager jobs like iterative closures and
dense_ids sampling) vs EXECUTION (the noop-sink write) — guide §1/§7.3.

Usage: python tools/profile_construct.py [name ...]

Defaults to every HEADLINE + TPCH + PIPELINE query at
$SPARK_GRAFT_SF_DIR (default sf0.1). Prints one line per query:
construct_s, exec_s, and the number of Spark jobs submitted during
construction (eager jobs at plan-build time are invisible in plan
dumps but show up here).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    names = sys.argv[1:]

    import bench
    import __spark_entry__ as entrymod
    from yelp_data_engineering_pipeline_spark.cache import release_tracked
    from yelp_data_engineering_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-construct")
    qs = entrymod.queries()
    if not names:
        names = bench.HEADLINE + bench.TPCH + bench.PIPELINE

    tracker = spark.sparkContext.statusTracker()

    # warm: JVM, python workers, codegen (same rationale as bench.py)
    qs["flagship_revenue_by_nation"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:  # noqa: BLE001
            pass
        release_tracked()

    print(f"{'query':36s} {'construct_s':>11s} {'jobs':>5s} {'exec_s':>8s} {'total_s':>8s}")
    for name in names:
        j0 = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        t1 = time.time()
        j1 = len(tracker.getJobIdsForGroup(None) or [])
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        print(
            f"{name:36s} {t1 - t0:11.3f} {j1 - j0:5d} {t2 - t1:8.3f} {t2 - t0:8.3f}"
        )
        release_tracked()


if __name__ == "__main__":
    main()
