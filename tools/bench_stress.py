"""Scale-tier wall-clock harness for COVERAGE.md's blowup tables.

    python tools/bench_stress.py <dir> [<dir> ...] -- <entry> [<entry> ...]

Runs the named catalog entries against each directory IN ONE warm
session (first dir doubles as the codegen warmer) and prints
`tier entry seconds rows` lines plus a markdown table at the end.
Measures `df.count()` — full plan execution without driver-side
materialization of wide outputs (the 100x pair lists).

Pseudo-entries (scale-path variants that aren't catalog shapes):
- dedup_embedding_lsh_p14: embedding_near_dup_lsh with the sizing rule
  applied (14 planes ≈ log2(200k/12) → bounded bucket occupancy), the
  documented growth path for 10x+ corpora.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    argv = sys.argv[1:]
    sep = argv.index("--")
    dirs, entries = argv[:sep], argv[sep + 1 :]

    from yelp_data_engineering_pipeline_spark.cache import release_tracked
    from yelp_data_engineering_pipeline_spark.session import get_spark

    spark = get_spark("bench-stress")

    def fn_for(name: str):
        if name.startswith("dedup_embedding_lsh_p"):
            # dedup_embedding_lsh_p14 / dedup_embedding_lsh_p14_cap2000
            from yelp_data_engineering_pipeline_spark.operators.dedup import (
                embedding_near_dup_lsh,
            )
            from yelp_data_engineering_pipeline_spark.tables import load

            spec = name.removeprefix("dedup_embedding_lsh_p")
            n_planes, _, cap = spec.partition("_cap")
            return lambda s, d: embedding_near_dup_lsh(
                load(s, d, "embeddings"),
                threshold=0.2,
                n_planes=int(n_planes),
                occupancy_cap=int(cap) if cap else None,
            )
        from yelp_data_engineering_pipeline_spark.plans.catalog import queries

        return queries()[name]

    results: dict[str, dict[str, tuple[float, int]]] = {}
    for d in dirs:
        tier = d.rstrip("/").rsplit("/", 1)[-1]
        results[tier] = {}
        for name in entries:
            fn = fn_for(name)
            t0 = time.time()
            try:
                n = fn(spark, d).count()
            except Exception as ex:  # record, keep sweeping
                print(f"{tier} {name} FAIL {type(ex).__name__}: {str(ex)[:200]}",
                      flush=True)
                results[tier][name] = (float("nan"), -1)
                release_tracked()
                continue
            dt = time.time() - t0
            release_tracked()
            results[tier][name] = (dt, n)
            print(f"{tier} {name} {dt:.1f}s {n} rows", flush=True)

    tiers = list(results)
    print("\n| entry | " + " | ".join(f"{t} sec (rows)" for t in tiers) + " |")
    print("|---|" + "---|" * len(tiers))
    for name in entries:
        cells = []
        for t in tiers:
            dt, n = results[t].get(name, (float("nan"), -1))
            cells.append(f"{dt:.1f} ({n})")
        print(f"| {name} | " + " | ".join(cells) + " |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
