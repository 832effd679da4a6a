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
# Round-9 window (exactly 50) — the storage-seam round.
# Composition (evidence ages recomputed from CORRECTNESS_r01–r08
# this round: 19 entries on r4 evidence, 47 on r5, rest r6+):
# - flagship (always first: the driver's smoke query);
# - the 19 r4-evidence TPC-H entries named in r8's
#   r9-window-first comment (they hit the 5-round age ceiling when
#   the r10 artifact lands; tpch_full.py is code-unchanged — pure
#   re-certifications);
# - the 6 entries registered by operators/upsert.py, which r9
#   changes again (StorageBackend seam, pinned commit versions,
#   parquet checkpoint sidecars, SQL addressing): the 5 r8 merge
#   entries plus the NEW merge_sql_time_travel (to_view /
#   VERSION AS OF through spark.sql — VERDICT r8 next-3's required
#   green row);
# - remaining 24 slots: the oldest-r5 refreshes, alphabetical head
#   of the 47-entry r5 cohort. The 23 remaining r5 entries
#   (func_hash_md5 .. window_running_distinct) head the r10 window
#   and reach the age ceiling only at r11.
_PRIORITY: tuple[str, ...] = (
    "flagship_revenue_by_nation",
    # -- the 19 r4-evidence TPC-H refreshes (mandatory: max-age) --
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
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
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_dominant_suppliers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_dormant_customers",
    # -- upsert.py changed in r9 (seam + checkpoints + SQL views) --
    "agg_incremental_merge",
    "cdc_snapshot_diff",
    "merge_upsert_idempotent",
    "merge_dml_where",
    "merge_into_conditional",
    "merge_sql_time_travel",
    # -- oldest r5-evidence refreshes (code unchanged) --
    "agg_conditional",
    "agg_countmin_topk",
    "agg_grouping_sets",
    "agg_groupwise_ols",
    "agg_mad_robust",
    "agg_mode_argmax",
    "agg_string_listagg",
    "agg_winsorized_stats",
    "cohort_retention",
    "dedup_canonical",
    "dedup_clusters",
    "dedup_containment",
    "dedup_exact_keep_first",
    "dedup_incremental_pairs",
    "dedup_jaccard_prefix",
    "dedup_minhash_accuracy",
    "dedup_minhash_lsh",
    "dedup_ngram_novelty",
    "dedup_source_matrix",
    "dedup_threshold_sweep",
    "diag_key_skew",
    "emb_label_centroid",
    "emb_nearest_centroid",
    "func_casts",
)
# r10-window-first candidates (non-debt, informational): the 23
# remaining r5-evidence entries — func_hash_md5, funnel_conversion,
# graph_pagerank, graph_triangles, join_bloom_prefilter,
# join_fuzzy_blocked, join_interval_overlap, join_left_anti,
# join_skew_hybrid, layout_zorder, mm_decode_stub, prep_rule_filter,
# prep_weighted_sample, rollup_time_cascade, setop_except,
# similarity_topk_sq8, text_bm25_topk, text_boolean_search,
# text_lang_confusion, text_lm_coverage, text_pmi_bigrams,
# text_token_count, window_running_distinct. They hit the max-age
# ceiling when the r11 artifact lands, so the r10 window must lead
# with them. The max-age debt guard
# (tests/test_plans.py::test_evidence_max_age) enforces this
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
