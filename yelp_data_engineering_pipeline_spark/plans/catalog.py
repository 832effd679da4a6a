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
# Round-6 window (exactly 50) — clears the LAST verification debt
# (VERDICT.md r5 next-1: after r5's first all-green 50/50 round, only
# the 18 late-r5 additions plus two refreshes separate the catalog
# from "every entry externally certified"). Composition:
# - flagship (always first: the driver's smoke query);
# - the 18 entries added late in r5 with no driver row yet (named
#   r6-window-first in the r5 comment; each local-differential green
#   at sf0.001/0.01/0.1);
# - 2 refreshes whose code/oracle changed in r6: join_asof (stale r1
#   row; duplicate-ts tiebreak landed late-r5, one-struct match
#   payload carry in r6) and join_asof_forward_tolerance (r5-green but
#   its oracle was rewritten in r6 from native ASOF to the
#   union+window formulation with the same tiebreak, per ADVICE r5);
#   join_asof_nearest and ts_ema_user / ts_ohlc_hourly also changed in
#   r6 and are already in the debt list above;
# - entries NEW or code-changed in r6 (added as the round progresses —
#   new entries must take window slots or the round creates fresh
#   debt);
# - remaining slots: refreshes of the entries with the OLDEST evidence
#   (latest driver row = r1; code unchanged since, so this is
#   re-certification, not debt).
_PRIORITY: tuple[str, ...] = (
    "flagship_revenue_by_nation",
    # -- the 18 late-r5 entries with no driver row (verification debt) --
    "join_asof_nearest",
    "emb_random_projection",
    "emb_dominant_direction",
    "dedup_cascade",
    "dedup_clusters_incremental",
    "mm_frame_dedup",
    "text_char_entropy",
    "prep_global_shuffle",
    "prep_bpe_merges",
    "prep_bpe_encode",
    "diag_source_drift",
    "diag_expectations",
    "prep_temperature_mix",
    "agg_hll_distinct_rollup",
    "agg_approx_percentile_gate",
    "ts_ema_user",
    "window_longest_streak",
    "ts_ohlc_hourly",
    # -- refreshes: code/oracle changed in r6 (as-of struct payload
    #    carry + tiebreak-bearing oracles, ADVICE r5) --
    "join_asof",
    "join_asof_forward_tolerance",
    # -- NEW or changed in r6 --
    "merge_upsert_idempotent",
    "similarity_topk_lsh",
    "similarity_recall_at_k",
    "ts_anomaly_zscore",
    "prep_reservoir_per_group",
    "agg_bitmap_distinct",
    "text_duplicate_ngram_spans",
    "stream_watermark_late_drop",
    "agg_kmv_distinct",
    "dedup_semdedup",
    "prep_dsir_scores",
    "similarity_topk_multiprobe",
    "agg_kmv_intersection",
    # -- oldest-evidence refreshes (latest row = r1, code unchanged) --
    "agg_groupby_stats",
    "join_inner_agg",
    "join_theta_residual",
    "join_left_semi",
    "join_left_outer_agg",
    "join_full_outer",
    "join_cross_small",
    "join_broadcast_dim",
    "dim_merge_get_or_create",
    "agg_count_join",
    "agg_distinct",
    "agg_count_distinct",
    "agg_percentile",
    "agg_rollup",
    "agg_pivot",
    "agg_cube",
)
# r7-window-first candidates (non-debt, informational): the remaining
# r1-evidence entries this round's additions displaced from the
# refresh tail — window_custom_sort, window_surrogate_keys,
# window_topk_per_group, window_first_nth, window_range_frame,
# setop_union_all, setop_intersect, func_regexp_extract_all,
# func_weekday_name, func_interval_arith, func_string_ops,
# func_url_parse, filter_project_pushdown, proj_compute_url,
# filter_fk_equality, filter_ilike, filter_isdigit_dispatch,
# date_series_explode, unpivot_stack, window_running_distinct (code
# unchanged since their green rows — re-certification, not debt; the
# debt guard above stays green without them).


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
