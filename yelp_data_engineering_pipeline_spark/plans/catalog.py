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
# Round-14 window (exactly 50) — the optimization-round-2 re-cert
# window. Composition (evidence ages recomputed from
# CORRECTNESS_r01–r13: r9=41, r10=31, r11=41, r12=48, r13=50; the 44
# r8-agers were all refreshed green in r13, so nothing hits the
# 5-round ceiling when the r14 artifact lands):
# - flagship (always first: the driver's smoke query);
# - every entry whose FORMULATION changed in r14 (lazy grid rank,
#   union-groupBy closure rounds + cascade overlap, single-parse IVF
#   kernel + search cosine, hoisted BPE round expressions) — VERDICT
#   r13 next-3 demands fresh driver rows for rewrites in the round
#   that ships them;
# - the r13 rewrites whose driver evidence predates their rewrite
#   (VERDICT r13 what's-wrong #2: window rotated before the r13
#   optimization work landed): tpch_q21, the minhash/simhash/semdedup
#   single-parse family, the lsh/multiprobe/rph similarity family,
#   pipeline_quality_dedup;
# - the remaining slots filled oldest-evidence-first from the 41
#   r9-age entries (dedup family complete — its module changed both
#   rounds; tpch_q9 preferred over q17 because q9 sits on the bench
#   TPCH tier). Ten r9 tpch entries (q2/q3/q4/q6/q7/q8/q17/q19/q20/
#   q22, formulations untouched since ≤r9) don't fit the 50; with
#   CORRECTNESS_r14 as the newest artifact the age floor is r9, so
#   they carry no mechanical debt (test_evidence_max_age stays green).
_PRIORITY: tuple[str, ...] = (
    "flagship_revenue_by_nation",
    # -- r14-changed formulations / direct consumers --
    "window_rank_distribution",
    "dedup_cascade",
    "dedup_clusters",
    "dedup_clusters_incremental",
    "prep_leakage_safe_split",
    "similarity_topk_ivf",
    "ann_index_search",
    "ann_index_search_bigbook",
    "prep_bpe_merges",
    "prep_bpe_encode",
    "graph_pagerank",
    "graph_triangles",
    # -- r13 rewrites owed a post-rewrite driver row --
    "tpch_q21_waiting_suppliers",
    "dedup_minhash_lsh",
    "dedup_minhash_accuracy",
    "dedup_simhash",
    "dedup_exact",
    "dedup_semdedup",
    "pipeline_quality_dedup",
    "similarity_topk_lsh",
    "similarity_topk_multiprobe",
    "similarity_topk_rph",
    # -- oldest evidence (r9) fill --
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
    "dedup_containment",
    "dedup_exact_keep_first",
    "dedup_incremental_pairs",
    "dedup_jaccard_prefix",
    "dedup_ngram_novelty",
    "dedup_source_matrix",
    "dedup_threshold_sweep",
    "diag_key_skew",
    "func_casts",
    "tpch_q10_returned_items",
    "tpch_q11_important_types",
    "tpch_q12_late_priority",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q16_part_supplier_relation",
    "tpch_q9_nation_profit",
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
    from ..operators import textrep  # noqa: F401
    from ..operators import textstats  # noqa: F401
    from ..operators import timeseries  # noqa: F401
    from ..operators import upsert  # noqa: F401
    from ..operators import zorder  # noqa: F401
    from ..streaming import windows  # noqa: F401
    _LOADED = True
