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


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


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
    from ..operators import asof  # noqa: F401
    from ..operators import dedup  # noqa: F401
    from ..operators import multimodal  # noqa: F401
    from ..operators import similarity  # noqa: F401
    from ..operators import textstats  # noqa: F401
    from ..streaming import windows  # noqa: F401
    _LOADED = True
