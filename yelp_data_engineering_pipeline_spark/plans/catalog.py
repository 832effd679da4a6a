"""Operator catalog: queries() + oracle_sql() (SURVEY.md §2 / M1).

Each entry is a named query over the driver's synthetic tables with a
DuckDB-equivalent ANSI SQL oracle. Column aliases match exactly on both
sides (driver hashes values after sorting columns by name).

Conventions for hash parity (SURVEY §7 hard points):
- double-typed aggregates are ROUND(x, 2)-ed on both sides;
- sums of integer columns are CAST to BIGINT in the oracle (DuckDB
  promotes to HUGEINT, Spark to LONG);
- time-of-day is encoded as seconds-since-midnight INT on both sides;
- every query has a deterministic ORDER-insensitive result set (no
  bare LIMIT without total order).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .flagship import FLAGSHIP_ORACLE_SQL, revenue_by_nation

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


# Emission priority for queries()/oracle_sql(): external harnesses
# verify only the FIRST 50 catalog entries per round, so the window
# ROTATES each round toward entries that have never had a third-party
# CORRECTNESS row (VERDICT.md r3 next-2: 80 entries were local-pass
# only after r3). Entries already driver-green with unchanged code
# keep that evidence and move to the tail.
#
# Round-12 window (exactly 50) — the IVF-assignment round.
# Composition (evidence ages recomputed from CORRECTNESS_r01–r11
# this round: 30 entries on r7 evidence, then r8=44/r9=41/r10=42/
# r11=50):
# - flagship (always first: the driver's smoke query);
# - the 30 r7-evidence entries named in r11's r12-window-first
#   comment (they hit the 5-round age ceiling when the r13 artifact
#   lands — mandatory refreshes; code unchanged for all of them);
# - the 11 entries registered by operators/similarity.py, which r12
#   rewrites (map-side IVF assignment — VERDICT r11 next-1);
# - ann_index_search, NEW this round (VERDICT r11 next-3: the
#   persisted-index read path gets its first driver row);
# - the 7 entries registered by operators/upsert.py, which r12
#   changes again (minmax_where plane fixes + zone-kind tolerance —
#   ADVICE r11 high/medium/low).
_PRIORITY: tuple[str, ...] = (
    "flagship_revenue_by_nation",
    # -- the 30 r7-evidence refreshes (mandatory: max-age at r13) --
    "filter_project_pushdown",
    "func_interval_arith",
    "func_regexp_extract_all",
    "func_string_ops",
    "func_url_parse",
    "func_weekday_name",
    "join_asof",
    "join_asof_forward_tolerance",
    "join_asof_nearest",
    "pipeline_quality_dedup",
    "prep_chunk_documents",
    "prep_decontaminate",
    "prep_pack_bins",
    "prep_pii_scrub",
    "prep_train_val_split",
    "proj_compute_url",
    "setop_intersect",
    "setop_union_all",
    "stream_sessionize",
    "stream_tumbling_window",
    "text_fingerprint",
    "text_quality",
    "unpivot_stack",
    "window_custom_sort",
    "window_first_nth",
    "window_pagination",
    "window_range_frame",
    "window_rank_distribution",
    "window_surrogate_keys",
    "window_topk_per_group",
    # -- similarity.py rewritten in r12 (map-side IVF assignment) --
    "similarity_topk_bruteforce",
    "similarity_topk_lsh",
    "similarity_topk_rph",
    "similarity_topk_ivf",
    "emb_label_centroid",
    "emb_nearest_centroid",
    "similarity_recall_at_k",
    "similarity_topk_sq8",
    "emb_random_projection",
    "emb_dominant_direction",
    "similarity_topk_multiprobe",
    # -- NEW in r12: the persisted ANN index's read path --
    "ann_index_search",
    # -- upsert.py changed in r12 (minmax_where plane fixes) --
    "agg_incremental_merge",
    "cdc_snapshot_diff",
    "merge_upsert_idempotent",
    "merge_dml_where",
    "merge_into_conditional",
    "merge_sql_time_travel",
    "merge_change_feed_stream",
)
# r13-window-first candidates (non-debt, informational): the entries
# left on r8 evidence after this round (44 as of the r11 recompute —
# agg_approx_distinct, diag_* and the r8 cohort; recompute from
# CORRECTNESS_r01–r12 next round). They hit the max-age ceiling when
# the r14 artifact lands, so the r13 window must lead with them, plus
# entries registered by any r13-changed module. The max-age debt
# guard (tests/test_plans.py::test_evidence_max_age) enforces this
# mechanically.


def _ordered(entries: dict) -> dict:
    head = {n: entries[n] for n in _PRIORITY if n in entries}
    tail = {n: v for n, v in entries.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return _ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return _ordered(_ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers catalog entries."""
    global _LOADED
    if _LOADED:
        return
    register("flagship_revenue_by_nation", revenue_by_nation, FLAGSHIP_ORACLE_SQL)
    # Registration modules (each calls register() at import time).
    from . import analytics  # noqa: F401
    from . import relational  # noqa: F401
    from . import scalar_funcs  # noqa: F401
    from . import nested  # noqa: F401
    from . import tpch  # noqa: F401
    from . import tpch_full  # noqa: F401
    from ..operators import ann_index  # noqa: F401
    from ..operators import asof  # noqa: F401
    from ..operators import bloom  # noqa: F401
    from ..operators import clustering  # noqa: F401
    from ..operators import collocations  # noqa: F401
    from ..operators import dedup  # noqa: F401
    from ..operators import graph  # noqa: F401
    from ..operators import linkage  # noqa: F401
    from ..operators import multimodal  # noqa: F401
    from ..operators import passages  # noqa: F401
    from ..operators import preptext  # noqa: F401
    from ..operators import profiling  # noqa: F401
    from ..operators import salting  # noqa: F401
    from ..operators import sampling  # noqa: F401
    from ..operators import similarity  # noqa: F401
    from ..operators import sketches  # noqa: F401
    from ..operators import textstats  # noqa: F401
    from ..operators import timeseries  # noqa: F401
    from ..operators import upsert  # noqa: F401
    from ..operators import zorder  # noqa: F401
    from ..streaming import windows  # noqa: F401
    _LOADED = True
