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
# Round-13 window (exactly 50) — the textrep-registration round.
# Composition (evidence ages recomputed from CORRECTNESS_r01–r12:
# r8=44, r9=41, r10=31, r11=42, r12=50):
# - flagship (always first: the driver's smoke query);
# - the 44 r8-evidence entries (they hit the 5-round age ceiling when
#   the r14 artifact lands — mandatory refreshes; code unchanged);
# - text_repetition_profile / text_repetition_gate, NEW this round
#   (operators/textrep.py shipped r12 pytest-only; VERDICT r12
#   next-1 — new entries must take slots in the round that adds them);
# - ann_index_search (operators/ann_index.py changed: store-record +
#   replica-meta advice fixes, fused _lloyd, sample_n) and
#   ann_index_search_bigbook, NEW (VERDICT r12 next-4: the >2048-value
#   one-row-broadcast codebook plane gets its first driver row);
# - emb_kmeans (operators/clustering.py changed: the fused Lloyd
#   round — VERDICT r12 next-2; bit-identical by test, re-certified
#   by the driver here).
_PRIORITY: tuple[str, ...] = (
    "flagship_revenue_by_nation",
    # -- the 44 r8-evidence refreshes (mandatory: max-age at r14) --
    "agg_approx_sketches",
    "agg_salted_groupby",
    "array_higher_order",
    "collect_sorted_list",
    "dedup_passage_prune",
    "event_transitions",
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
    "mm_audio_chunks",
    "mm_binary_meta",
    "mm_frame_sample",
    "pipeline_corpus_prep",
    "prep_interleave_sources",
    "prep_leakage_safe_split",
    "prep_length_bins",
    "prep_repetition_stats",
    "prep_score_quantile_norm",
    "prep_shard_histogram",
    "prep_stratified_sample",
    "prep_token_budget_mix",
    "prep_vocab",
    "profile_by_source",
    "profile_table",
    "sql_api_groupby",
    "stream_session_window_native",
    "stream_sliding_window",
    "stream_stream_join",
    "stream_window_approx_distinct",
    "text_lang_id",
    "text_tfidf_topk",
    "tpch_q18_large_orders",
    "tpch_q1_pricing_summary",
    "tpch_q5_local_supplier_volume",
    "ts_gapfill_locf",
    "window_lag_lead",
    "window_running_sum",
    # -- NEW in r13: the Gopher repetition profile/gate (textrep.py) --
    "text_repetition_profile",
    "text_repetition_gate",
    # -- ann_index.py changed in r13 (+ NEW big-codebook transport row) --
    "ann_index_search",
    "ann_index_search_bigbook",
    # -- clustering.py changed in r13 (fused Lloyd rounds) --
    "emb_kmeans",
)
# r14-window-first candidates (non-debt, informational): the entries
# left on r9 evidence after this round (41 as of the r12 recompute —
# recompute from CORRECTNESS_r01–r13 next round). They hit the
# max-age ceiling when the r15 artifact lands, so the r14 window must
# lead with them, plus entries registered by any r14-changed module.
# The max-age debt guard (tests/test_plans.py::test_evidence_max_age)
# enforces this mechanically.


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
