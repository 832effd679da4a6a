"""Star-join axis scaling evidence (VERDICT r6 next-3, extended r7 to
an arbitrary tier ladder): time the flagship + the 5-query TPC-H tier
at every given tier dir and print per-query consecutive-tier ratios.
The 100x story's rule of thumb: a healthy distributed plan stays
<= ~2x wall per 10x data on a fixed local[32] box (scans parallelize,
shuffles grow linearly, nothing super-linear sneaks in). Two decades
(sf0.1 -> x10 -> x100, 60M-row lineitem at the top) make the
extrapolation to cluster scale a measurement, not a guess.

    python tools/make_stress.py            # once, ~1 min (x10)
    python -c "import sys; sys.path.insert(0,'tools'); \
from make_stress import build_stress; \
build_stress('/root/testdata/sf0.1','/tmp/stressx100',factor=100,star_only=True)"
    python tools/bench_scaling.py          # sf0.1 vs /tmp/stressx10
    python tools/bench_scaling.py /root/testdata/sf0.1 /tmp/stressx10 /tmp/stressx100

Methodology matches bench.py: noop sink, whole-stage-codegen warmup on
sf0.001 first so all tiers are timed steady-state, release_tracked()
between queries so nothing is cached across timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "flagship_revenue_by_nation",
    "tpch_q1_pricing_summary",
    "tpch_q5_local_supplier_volume",
    "tpch_q9_nation_profit",
    "tpch_q18_large_orders",
    "tpch_q21_waiting_suppliers",
]


def main() -> None:
    tiers = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/stressx10"]
    for d in tiers[1:]:
        if not os.path.exists(os.path.join(d, "lineitem.parquet")):
            sys.exit(f"{d}/lineitem.parquet missing — run tools/make_stress.py first")

    import __spark_entry__ as entry
    from yelp_data_engineering_pipeline_spark.cache import release_tracked
    from yelp_data_engineering_pipeline_spark.session import get_spark

    spark = get_spark("bench-scaling")
    qs = entry.queries()

    # codegen warmup on the tiny tier (same JMH-style rationale as bench.py)
    for name in QUERIES:
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        release_tracked()

    def run(sf_dir: str) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in QUERIES:
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            out[name] = round(time.time() - t0, 3)
            release_tracked()
        return out

    timings = [run(d) for d in tiers]
    out: dict = {
        "metric": "star_axis_scaling",
        "tier_dirs": tiers,
        "tier_sec": timings,
        "tier_total": [round(sum(t.values()), 3) for t in timings],
    }
    for i in range(1, len(timings)):
        out[f"ratio_t{i}_over_t{i-1}"] = {
            n: round(timings[i][n] / max(timings[i - 1][n], 1e-9), 2)
            for n in QUERIES
        }
    out["yelp_star"] = yelp_star_ladder(spark)
    print(json.dumps(out))


def yelp_star_ladder(spark) -> dict:
    """The PRODUCT path's own ×10 ladder (VERDICT r8 next-7): bench.py
    times ingest+normalize at 8k businesses and the incremental MERGE
    at 2k — overhead-dominated by its own admission. Run the same two
    stages at ×10 (80k ingest, 20k-row MERGE batch overlapping 5k
    re-scrapes) and report the growth factors; the ≤2×-per-decade rule
    the lineitem star meets should hold for the star maintenance path
    too (the stages are one NDJSON scan + bounded broadcast dim merges
    + a key-partitioned anti-join union — all linear)."""
    import shutil
    import tempfile
    import time as _time
    from pathlib import Path

    from tests.yelp_fixtures import make_results, write_ndjson
    from yelp_data_engineering_pipeline_spark.cache import release_tracked
    from yelp_data_engineering_pipeline_spark.operators.upsert import (
        normalize_incremental,
    )
    from yelp_data_engineering_pipeline_spark.plans.normalize import normalize
    from yelp_data_engineering_pipeline_spark.schemas import RESULTS_SCHEMA

    def tier(n_total: int, n_first: int, overlap: int, seed: int) -> dict:
        tmp = tempfile.mkdtemp(prefix=f"yelp_star_{n_total}.")
        try:
            rows = make_results(n_total, seed=seed)
            p1 = write_ndjson(rows[:n_first], Path(tmp) / "b1.ndjson")
            p2 = write_ndjson(rows[n_first - overlap:],
                              Path(tmp) / "b2.ndjson")

            def write_star(tables, vdir):
                for name, df in tables.items():
                    df.write.mode("overwrite").parquet(
                        f"{tmp}/{vdir}/{name}")

            out: dict[str, float] = {}
            t0 = _time.time()
            first = normalize(
                spark.read.schema(RESULTS_SCHEMA).json(str(p1)))
            write_star(first, "v1")
            out["ingest_normalize"] = round(_time.time() - t0, 3)

            t0 = _time.time()
            stored = {name: spark.read.parquet(f"{tmp}/v1/{name}")
                      for name in first}
            merged = normalize_incremental(
                spark.read.schema(RESULTS_SCHEMA).json(str(p2)), stored)
            write_star(merged, "v2")
            out["incremental_merge"] = round(_time.time() - t0, 3)
            return out
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
            spark.catalog.clearCache()
            release_tracked()

    # warmup (codegen for the normalize/merge expression trees)
    tier(1_000, 800, 50, seed=3)
    base = tier(10_000, 8_000, 500, seed=77)     # bench.py's fixture
    x10 = tier(100_000, 80_000, 5_000, seed=77)  # the ×10 decade
    return {
        "base_8k": base,
        "x10_80k": x10,
        "growth": {
            k: round(x10[k] / max(base[k], 1e-9), 2) for k in base
        },
    }


if __name__ == "__main__":
    main()
