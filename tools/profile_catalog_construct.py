"""Construction-time (driver-side) profile of EVERY catalog entry:
time + Spark jobs submitted while building the plan, no action run.
Sorted worst-first. Usage: python tools/profile_catalog_construct.py [sf_dir]."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import __spark_entry__ as entrymod
    from yelp_data_engineering_pipeline_spark.cache import release_tracked
    from yelp_data_engineering_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("profile-catalog-construct")
    tracker = spark.sparkContext.statusTracker()
    qs = entrymod.queries()

    def jobs() -> int:
        return len(tracker.getJobIdsForGroup(None) or [])

    rows = []
    for name, fn in qs.items():
        t0, j0 = time.time(), jobs()
        try:
            fn(spark, sf_dir)
            rows.append((time.time() - t0, jobs() - j0, name, ""))
        except Exception as exc:  # noqa: BLE001
            rows.append((time.time() - t0, jobs() - j0, name, f"ERR {exc}"))
        release_tracked()
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"{'construct_s':>11s} {'jobs':>5s}  name")
    for dt, nj, name, err in rows:
        print(f"{dt:11.3f} {nj:5d}  {name} {err[:80]}")
    print(f"\ntotal construction: {total:.1f}s over {len(rows)} entries")


if __name__ == "__main__":
    main()
