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
# Round-8 window (exactly 50) — the manifest-lakehouse round.
# Composition (evidence ages recomputed from CORRECTNESS_r01–r07
# this round: 21 entries on r3 evidence, 43 on r4, rest r5+):
# - flagship (always first: the driver's smoke query);
# - the 21 r3-evidence refreshes named in r7's r8-window-first
#   comment (the max-age guard's floor becomes r3 the moment the r8
#   artifact lands — these are mandatory, code unchanged since their
#   green rows);
# - the 5 entries registered by operators/upsert.py, which this
#   round re-architects around a manifest version plane (VERDICT r7
#   next-1: object-store-capable lakehouse): agg_incremental_merge,
#   cdc_snapshot_diff, merge_upsert_idempotent, merge_dml_where,
#   merge_into_conditional — changed-module slots per the rotation
#   rule (cdc_snapshot_diff doubles as an r4 refresh);
# - remaining 23 slots: oldest r4-evidence refreshes, all 20
#   non-TPC-H r4 entries plus the three headline TPC-H queries
#   (q1/q5/q18 — the plan-pinned bench tier). The 19 remaining
#   TPC-H r4 entries (tpch_full.py, code unchanged) reach the age
#   ceiling only at r10 and head the r9 window.
_PRIORITY: tuple[str, ...] = (
    "flagship_revenue_by_nation",
    # -- the 21 r3-evidence refreshes (mandatory: max-age floor) --
    "agg_approx_sketches",
    "array_higher_order",
    "collect_sorted_list",
    "explode_word_counts",
    "explode_zip_pairs",
    "filter_disjunctive_range",
    "filter_quarantine",
    "func_case_mapping",
    "func_html_unescape",
    "func_json_extract",
    "func_time_parse",
    "join_range_bucketed",
    "map_functions",
    "mm_binary_meta",
    "prep_repetition_stats",
    "prep_vocab",
    "sql_api_groupby",
    "text_lang_id",
    "text_tfidf_topk",
    "window_lag_lead",
    "window_running_sum",
    # -- upsert.py re-architected in r8 (manifest version plane) --
    "agg_incremental_merge",
    "cdc_snapshot_diff",
    "merge_upsert_idempotent",
    "merge_dml_where",
    "merge_into_conditional",
    # -- oldest r4-evidence refreshes (code unchanged) --
    "agg_salted_groupby",
    "dedup_passage_prune",
    "event_transitions",
    "mm_audio_chunks",
    "mm_frame_sample",
    "pipeline_corpus_prep",
    "prep_interleave_sources",
    "prep_leakage_safe_split",
    "prep_length_bins",
    "prep_score_quantile_norm",
    "prep_shard_histogram",
    "prep_stratified_sample",
    "prep_token_budget_mix",
    "profile_by_source",
    "profile_table",
    "stream_session_window_native",
    "stream_sliding_window",
    "stream_stream_join",
    "stream_window_approx_distinct",
    "ts_gapfill_locf",
    "tpch_q1_pricing_summary",
    "tpch_q5_local_supplier_volume",
    "tpch_q18_large_orders",
)
# r9-window-first candidates (non-debt, informational): the 19
# remaining r4-evidence entries — tpch_q2_min_cost_supplier,
# tpch_q3_shipping_priority, tpch_q4_order_priority,
# tpch_q6_forecast_revenue, tpch_q7_volume_shipping,
# tpch_q8_market_share, tpch_q9_nation_profit,
# tpch_q10_returned_items, tpch_q11_important_types,
# tpch_q12_late_priority, tpch_q13_customer_distribution,
# tpch_q14_promo_effect, tpch_q15_top_supplier,
# tpch_q16_part_supplier_relation, tpch_q17_small_quantity,
# tpch_q19_disjunctive_revenue, tpch_q20_dominant_suppliers,
# tpch_q21_waiting_suppliers, tpch_q22_dormant_customers. They hit
# the max-age ceiling when the r10 artifact lands, so the r9 window
# must lead with them (tpch_full.py is code-unchanged; these are
# pure re-certifications). The max-age debt guard
# (tests/test_plans.py::test_evidence_max_age) enforces this
# mechanically. NOT window-slotted despite the r8 ingest.py change
# (CDC tiebreak determinism): no catalog entry registers from
# streaming/ingest.py — run_cdc_upsert_stream is pytest-graded
# (tests/test_streaming.py CDC ledger tests).


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
