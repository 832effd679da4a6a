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
# Round-11 window (exactly 50) — the lakehouse-maintenance round.
# Composition (evidence ages recomputed from CORRECTNESS_r01–r10
# this round: 29 entries on r6 evidence, 43 on r7, rest r8+):
# - flagship (always first: the driver's smoke query);
# - the 29 r6-evidence entries named in r10's r11-window-first
#   comment (they hit the 5-round age ceiling when the r12 artifact
#   lands — mandatory refreshes; code unchanged for all of them);
# - the 7 entries registered by operators/upsert.py, which r11
#   changes again (distributed checkpoint build, executor-side DV
#   assembly, change-feed hardening — VERDICT r10 next-1/2 + ADVICE
#   — and the clustering-decay maintenance leg, next-7);
# - remaining 13 slots: the oldest-r7 refreshes, alphabetical head
#   of the 43-entry r7 cohort (agg_bitmap_distinct ..
#   filter_isdigit_dispatch). The 30 remaining r7 entries head the
#   r12 window and reach the age ceiling only at r13.
_PRIORITY: tuple[str, ...] = (
    "flagship_revenue_by_nation",
    # -- the 29 r6-evidence refreshes (mandatory: max-age) --
    "agg_pivot",
    "agg_rollup",
    "dedup_cascade",
    "dedup_clusters_incremental",
    "dedup_semdedup",
    "diag_expectations",
    "diag_source_drift",
    "dim_merge_get_or_create",
    "join_broadcast_dim",
    "join_cross_small",
    "join_full_outer",
    "join_inner_agg",
    "join_left_outer_agg",
    "join_left_semi",
    "join_theta_residual",
    "mm_frame_dedup",
    "prep_bpe_encode",
    "prep_bpe_merges",
    "prep_dsir_scores",
    "prep_global_shuffle",
    "prep_reservoir_per_group",
    "prep_temperature_mix",
    "stream_watermark_late_drop",
    "text_char_entropy",
    "text_duplicate_ngram_spans",
    "ts_anomaly_zscore",
    "ts_ema_user",
    "ts_ohlc_hourly",
    "window_longest_streak",
    # -- upsert.py changed in r11 (distributed ckpt build, executor
    #    DV assembly, feed hardening, clustering-decay leg) --
    "agg_incremental_merge",
    "cdc_snapshot_diff",
    "merge_upsert_idempotent",
    "merge_dml_where",
    "merge_into_conditional",
    "merge_sql_time_travel",
    "merge_change_feed_stream",
    # -- oldest r7-evidence refreshes (code unchanged) --
    "agg_bitmap_distinct",
    "agg_kmv_intersection",
    "date_series_explode",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "emb_kmeans",
    "filter_fk_equality",
    "filter_ilike",
    "filter_isdigit_dispatch",
)
# r12-window-first candidates (non-debt, informational): the 30
# remaining r7-evidence entries — filter_project_pushdown,
# func_interval_arith, func_regexp_extract_all, func_string_ops,
# func_url_parse, func_weekday_name, join_asof and the rest of the
# r7 cohort (recompute from CORRECTNESS_r01–r11 next round). They
# hit the max-age ceiling when the r13 artifact lands, so the r12
# window must lead with them, plus entries registered by any
# r12-changed module. The max-age debt guard
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
