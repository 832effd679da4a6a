"""Star-join axis scaling evidence (VERDICT r6 next-3): time the
flagship + the 5-query TPC-H tier at sf0.1 and at the x10 stress tier
(6M-row lineitem, /tmp/stressx10 — build with tools/make_stress.py)
and print the per-query ratio. The 100x story's rule of thumb: a
healthy distributed plan stays <= ~2x wall per 10x data on a fixed
local[32] box (scans parallelize, shuffles grow linearly, nothing
super-linear sneaks in).

    python tools/make_stress.py            # once, ~1 min
    python tools/bench_scaling.py          # prints one JSON line

Methodology matches bench.py: noop sink, whole-stage-codegen warmup on
sf0.001 first so both tiers are timed steady-state, release_tracked()
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
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stressx10"
    if not os.path.exists(os.path.join(big, "lineitem.parquet")):
        sys.exit(f"{big}/lineitem.parquet missing — run tools/make_stress.py first")

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

    t_base = run(base)
    t_big = run(big)
    ratios = {n: round(t_big[n] / max(t_base[n], 1e-9), 2) for n in QUERIES}
    print(
        json.dumps(
            {
                "metric": "star_axis_x10_scaling",
                "base_dir": base,
                "big_dir": big,
                "base_sec": t_base,
                "x10_sec": t_big,
                "ratio_x10_over_base": ratios,
                "base_total": round(sum(t_base.values()), 3),
                "x10_total": round(sum(t_big.values()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
