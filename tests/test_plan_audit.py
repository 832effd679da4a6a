"""Catalog-wide physical-plan anti-pattern sweep (round 5).

The per-operator plan tests in test_plans.py pin the HOT entries'
shapes; this sweep is the broad backstop — it PLANS (never executes)
every catalog entry at sf0.001 and fails on the one anti-pattern that
is never acceptable at 100 TB: an unlabeled CartesianProduct. A
cartesian that sneaks into any of ~180 entries via a dropped join key
or a planner fallback would otherwise only surface as a timeout at the
stress tier.

BroadcastNestedLoopJoin is NOT flagged: every occurrence in the
catalog is a 1-row/k-row broadcast scalar attach (corpus stats,
thresholds, page boundaries), which is the intended shape. A
CartesianProduct, by contrast, means BOTH sides were deemed
non-broadcastable AND no key was found — that is never intended.
"""

from __future__ import annotations

import __spark_entry__ as entry
from yelp_data_engineering_pipeline_spark.cache import release_tracked

# Labeled brute-force tiers: the cross join IS the documented semantics
# (exact verification baselines over a bounded query side). Everything
# else must plan key-based or broadcast.
_ALLOWED_CARTESIAN: frozenset[str] = frozenset()


def test_no_catalog_entry_plans_a_cartesian_product(spark, sf_dir):
    problems: list[str] = []
    for name, fn in entry.queries().items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            problems.append(f"{name}: planning failed: {type(ex).__name__}: {ex}")
            continue
        finally:
            release_tracked()
        if "CartesianProduct" in plan and name not in _ALLOWED_CARTESIAN:
            problems.append(f"{name}: CartesianProduct in physical plan")
    assert not problems, "\n".join(problems)


def test_no_catalog_entry_plans_rowwise_python(spark, sf_dir):
    """"UDFs are the slow path" made mechanical: no catalog entry may
    plan a row-at-a-time Python eval (BatchEvalPython). Arrow-batched
    stages (ArrowEvalPython, mapInPandas/FlatMapGroupsInPandas — e.g.
    the multimodal kernels and the EMA recurrence) are the sanctioned
    Python boundary and are NOT flagged."""
    problems: list[str] = []
    for name, fn in entry.queries().items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            problems.append(f"{name}: planning failed: {type(ex).__name__}: {ex}")
            continue
        finally:
            release_tracked()
        if "BatchEvalPython" in plan:
            problems.append(f"{name}: row-at-a-time Python stage in plan")
    assert not problems, "\n".join(problems)
