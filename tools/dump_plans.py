"""Dump .explain("formatted") for bench-surface queries into plans/<tag>/.

Usage: python tools/dump_plans.py <tag> [suffix] [name ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix defaults to "before").
With no names, dumps every HEADLINE + TPCH + PIPELINE query from
bench.py at $SPARK_GRAFT_SF_DIR (default sf0.1 — plan shape only, no
execution, so the SF mostly affects AQE estimates, not structure).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]

    import bench
    import __spark_entry__ as entrymod
    from yelp_data_engineering_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-plans")
    qs = entrymod.queries()
    if not names:
        names = bench.HEADLINE + bench.TPCH + bench.PIPELINE

    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    from yelp_data_engineering_pipeline_spark.cache import release_tracked

    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({plan.count('Exchange')} Exchange)")
        release_tracked()


if __name__ == "__main__":
    main()
