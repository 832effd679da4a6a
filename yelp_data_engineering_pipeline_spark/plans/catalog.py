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
# only after r3). Entries already driver-green in r1/r3 with unchanged
# code keep that evidence and move to the tail.
#
# Round-4 window (exactly 50):
# - flagship (always first: the driver's smoke query);
# - agg_conditional (r3's only red row — now integer-exact, fix proof);
# - mm_decode_stub (gained a real oracle this round — clears no_oracle);
# - the full 22-query TPC-H suite (never checked; the canonical
#   join+agg hard cases);
# - the never-checked extension rows: passage dedup, multimodal
#   frame/audio, the four r3 streaming additions, graph, prep/profile/
#   timeseries families;
# - similarity_topk_lsh + similarity_recall_at_k (plan changed this
#   round: multi-table random-hyperplane default needs a fresh row);
# - salted aggregation + CDC diff (families with no driver row yet).
# Remaining never-checked entries (agg_* variants, funnel/cohort,
# dedup audit variants, fuzzy/bloom joins, zorder) rotate into the
# round-5 window — along with every entry whose code changed AFTER this
# window was frozen and which therefore needs a fresh driver row:
#   join_left_anti, setop_except   (r1 rows were VACUOUS 0-row passes;
#                                   predicates strengthened in r4)
#   agg_groupwise_ols              (int64-overflow fix at sf0.1)
#   dedup_minhash_accuracy, dedup_minhash_lsh, dedup_incremental_pairs,
#   dedup_clusters                 (shuffle_hash/merge join pinning)
#   prep_rule_filter               (new in r4)
_PRIORITY: tuple[str, ...] = (
    "flagship_revenue_by_nation",
    "agg_conditional",
    "mm_decode_stub",
    # -- TPC-H: the full suite, never driver-checked --
    "tpch_q1_pricing_summary",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_nation_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_types",
    "tpch_q12_late_priority",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q16_part_supplier_relation",
    "tpch_q17_small_quantity",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_dominant_suppliers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_dormant_customers",
    # -- never-checked extension families --
    "dedup_passage_prune",
    "mm_frame_sample",
    "mm_audio_chunks",
    "stream_sliding_window",
    "stream_session_window_native",
    "stream_window_approx_distinct",
    "stream_stream_join",
    "graph_pagerank",
    "graph_triangles",
    "prep_stratified_sample",
    "pipeline_corpus_prep",
    "prep_length_bins",
    "prep_shard_histogram",
    "prep_token_budget_mix",
    "prep_leakage_safe_split",
    "prep_interleave_sources",
    "prep_score_quantile_norm",
    "profile_table",
    "profile_by_source",
    "ts_gapfill_locf",
    "event_transitions",
    # -- plan changed this round (multi-table rph default) --
    "similarity_topk_lsh",
    "similarity_recall_at_k",
    # -- families with no driver row yet --
    "agg_salted_groupby",
    "cdc_snapshot_diff",
)


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
    from ..operators import similarity  # noqa: F401
    from ..operators import textstats  # noqa: F401
    from ..operators import timeseries  # noqa: F401
    from ..operators import upsert  # noqa: F401
    from ..operators import zorder  # noqa: F401
    from ..streaming import windows  # noqa: F401
    _LOADED = True
