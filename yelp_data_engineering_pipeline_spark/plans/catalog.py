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
# Round-5 window (exactly 50) — the ZERO-VERIFICATION-DEBT round
# (VERDICT.md r4 next-2). Composition:
# - flagship (always first: the driver's smoke query);
# - agg_conditional at position 2 (hash-red in r3 AND r4 while the
#   strict local exact-value differential passed; r5 removes the last
#   suspect — BOOLEAN output columns, the only such entry of 168 — by
#   CASTing bool_or/bool_and to INT on both engines);
# - ALL 35 entries that have never had a driver CORRECTNESS row
#   (computed as catalog minus the union of r1/r3/r4 row keys);
# - the 4 entries whose code changed AFTER their green row was
#   recorded: join_left_anti + setop_except (r1 rows were VACUOUS
#   0-row passes; predicates strengthened in r4), dedup_minhash_lsh +
#   dedup_clusters (r3-green; join-strategy pinning landed in r4);
# - entries whose code/oracle changes IN r5 and therefore need a fresh
#   row: mm_decode_stub (oracle NULL-payload coalesce, ADVICE r4),
#   prep_rule_filter is already in the never-checked set (coalesce +
#   whitespace-class fixes, ADVICE r4), graph_pagerank (heap-residual
#   work, VERDICT r4 next-6);
# - the 6 operators ADDED in r5 (sq8 ANN tier, count-min heavy
#   hitters, A-ES weighted sampling, hybrid skew join, prefix-filter
#   exact Jaccard join, BM25 retrieval top-k) — new entries must take
#   window slots or the round creates fresh debt. They displaced the
#   r1-refresh padding (dim_merge_get_or_create, window_surrogate_keys
#   keep their r1 rows; code unchanged since).
# After this window every entry in the catalog has a driver row from a
# round whose code matches current, except any r5 stragglers — which
# the same rule rotates into r6. Known r6-window-first stragglers (the
# 50 slots were already spoken for): agg_hll_distinct_rollup,
# prep_temperature_mix, ts_ema_user, agg_approx_percentile_gate,
# dedup_cascade, emb_random_projection, join_asof_nearest,
# diag_source_drift, prep_global_shuffle, prep_bpe_merges,
# prep_bpe_encode, mm_frame_dedup, window_longest_streak,
# text_char_entropy, emb_dominant_direction,
# dedup_clusters_incremental, diag_expectations, ts_ohlc_hourly (all
# added late in r5;
# each local-differential green at sf0.001/0.01/0.1). Also r6-refresh:
# join_asof (r1-green; gained a deterministic duplicate-ts value
# tiebreak late in r5 — value-identical on fixture data, differential
# re-verified, but the code changed after its row).
_PRIORITY: tuple[str, ...] = (
    "flagship_revenue_by_nation",
    "agg_conditional",
    # -- the 35 never-driver-checked entries --
    "agg_grouping_sets",
    "agg_mad_robust",
    "agg_string_listagg",
    "agg_mode_argmax",
    "agg_winsorized_stats",
    "window_running_distinct",
    "agg_groupwise_ols",
    "funnel_conversion",
    "cohort_retention",
    "rollup_time_cascade",
    "func_casts",
    "func_hash_md5",
    "join_asof_forward_tolerance",
    "join_interval_overlap",
    "join_bloom_prefilter",
    "text_pmi_bigrams",
    "emb_label_centroid",
    "emb_nearest_centroid",
    "dedup_exact_keep_first",
    "dedup_containment",
    "dedup_threshold_sweep",
    "dedup_incremental_pairs",
    "dedup_minhash_accuracy",
    "dedup_source_matrix",
    "dedup_ngram_novelty",
    "join_fuzzy_blocked",
    "text_token_count",
    "text_lang_confusion",
    "dedup_canonical",
    "text_boolean_search",
    "text_lm_coverage",
    "prep_rule_filter",
    "diag_key_skew",
    "agg_incremental_merge",
    "layout_zorder",
    # -- stale evidence: code changed after the green row --
    "join_left_anti",
    "setop_except",
    "dedup_minhash_lsh",
    "dedup_clusters",
    # -- changed in r5 (oracle / heap-path edits; graph_triangles
    #    composes minhash_lsh_pairs, whose join pin became
    #    posture-aware in r5) --
    "mm_decode_stub",
    "graph_pagerank",
    "graph_triangles",
    # -- NEW in r5 (never externally checked — must take window slots,
    #    else this round creates the same debt it was closing) --
    "similarity_topk_sq8",
    "agg_countmin_topk",
    "prep_weighted_sample",
    "join_skew_hybrid",
    "dedup_jaccard_prefix",
    "text_bm25_topk",
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
    from ..operators import sampling  # noqa: F401
    from ..operators import similarity  # noqa: F401
    from ..operators import sketches  # noqa: F401
    from ..operators import textstats  # noqa: F401
    from ..operators import timeseries  # noqa: F401
    from ..operators import upsert  # noqa: F401
    from ..operators import zorder  # noqa: F401
    from ..streaming import windows  # noqa: F401
    _LOADED = True
