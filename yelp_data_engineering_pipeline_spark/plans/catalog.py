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
# Round-7 window (exactly 50) — the evidence-freshness round
# (VERDICT.md r6 next-1: with the whole catalog externally certified,
# the remaining gap is STALENESS — 19 entries whose latest driver row
# is still r1). Composition:
# - flagship (always first: the driver's smoke query);
# - the 19 r1-evidence entries (computed from the CORRECTNESS_r*.json
#   artifacts this round; the r6 comment listed 20 but
#   window_running_distinct already holds an r4 row) — code unchanged
#   since their green rows, so these are re-certifications;
# - 6 entries whose code or oracle CHANGED in r7: the three as-of
#   entries (explicit NULLS FIRST tiebreak order on both sides,
#   ADVICE r6), agg_bitmap_distinct (NULL-id guard, ADVICE r6), and
#   merge_upsert_idempotent (upsert.py gained the flock commit
#   protocol — the merge_upsert dataflow is unchanged but lives in the
#   changed module), and agg_kmv_intersection (estimator factored
#   into the reusable kmv_intersection_estimate so pytest can hold the
#   independent-formulation truth — VERDICT r6 next-2);
# - remaining 24 slots: the oldest-evidence refreshes (latest row =
#   r3), picked dedup/similarity/prep-first since those modules carry
#   the most engineering risk.
_PRIORITY: tuple[str, ...] = (
    "flagship_revenue_by_nation",
    # -- the 19 r1-evidence re-certifications --
    "window_first_nth",
    "window_range_frame",
    "date_series_explode",
    "unpivot_stack",
    "filter_project_pushdown",
    "proj_compute_url",
    "filter_fk_equality",
    "filter_ilike",
    "filter_isdigit_dispatch",
    "window_custom_sort",
    "window_surrogate_keys",
    "window_topk_per_group",
    "setop_union_all",
    "setop_intersect",
    "func_regexp_extract_all",
    "func_weekday_name",
    "func_interval_arith",
    "func_string_ops",
    "func_url_parse",
    # -- code/oracle changed in r7 --
    "join_asof",
    "join_asof_forward_tolerance",
    "join_asof_nearest",
    "agg_bitmap_distinct",
    "merge_upsert_idempotent",
    "merge_dml_where",
    "merge_into_conditional",
    "agg_kmv_intersection",
    # -- oldest-evidence refreshes (latest row = r3, code unchanged) --
    "dedup_exact",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_ngram_jaccard",
    "similarity_topk_bruteforce",
    "similarity_topk_ivf",
    "similarity_topk_rph",
    "emb_kmeans",
    "prep_chunk_documents",
    "prep_decontaminate",
    "prep_pack_bins",
    "prep_pii_scrub",
    "prep_train_val_split",
    "pipeline_quality_dedup",
    "text_quality",
    "text_fingerprint",
    "stream_sessionize",
    "stream_tumbling_window",
    "window_pagination",
    "window_rank_distribution",
)
# r8-window-first candidates (non-debt, informational): the 20
# remaining r3-evidence entries this round's changes displaced from
# the refresh tail — agg_approx_sketches, array_higher_order,
# collect_sorted_list, explode_zip_pairs, filter_disjunctive_range,
# prep_vocab (displaced by the r7 kmv refactor slot),
# func_json_extract (displaced by the r7 merge_dml_where slot),
# explode_word_counts (displaced by the r7 merge_into_conditional slot),
# filter_quarantine, func_case_mapping, func_html_unescape,
# func_time_parse, join_range_bucketed, map_functions, mm_binary_meta,
# prep_repetition_stats, sql_api_groupby, text_lang_id,
# text_tfidf_topk, window_lag_lead, window_running_sum. The max-age
# debt guard (tests/test_plans.py::test_evidence_max_age) starts
# FAILING for these once the r8 artifact lands unless they hold r8
# window slots — staleness can no longer silently re-accumulate.
# NOT window-slotted despite living in r7-touched modules (plans are
# bit-identical, verified): stream_watermark_late_drop (windows.py
# gained the late_filter_lag PARAMETER, default preserves the entry's
# exact frame; the new differential test is the stronger guard) and
# similarity_recall_at_k (similarity.py only factored the probe's
# sample into _isotropy_sample for a plan assertion).


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
