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
    print(json.dumps(out))


if __name__ == "__main__":
    main()
