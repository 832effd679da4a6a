"""Deterministic LIMIT/OFFSET pagination (SURVEY.md §2.5 W1).

The reference paginates with SQLAlchemy ``.limit(n).offset(o)`` and **no
ORDER BY** (/root/reference/database/app.py:74,80-81,123,129-130), which
relies on Postgres's arbitrary-but-stable row order. In a distributed
engine unordered pagination is nondeterministic by construction, so we
require an explicit total-order key — a documented semantic delta
(SURVEY §7 hard point 2).

Scale note: pagination is inherently a global-order operation. The
row_number variant below uses a single-partition window and is intended
for driver-bound result pages (the reference's use case: page_size=10
API pages). For deep pagination over huge results, prefer keyset
pagination (``after_key``), which stays fully distributed: a pushed-down
range filter + per-partition top-k sort + global merge of page_size rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def paginate(df: DataFrame, order_by: Sequence[str], page: int, page_size: int) -> DataFrame:
    """row_number-based page fetch; returns the page plus its ``rn``.

    Equivalent to ``ORDER BY order_by LIMIT page_size OFFSET
    (page-1)*page_size`` with deterministic order.
    """
    if page < 1 or page_size < 1:
        raise ValueError("page and page_size must be >= 1")
    offset = (page - 1) * page_size
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter((F.col("rn") > offset) & (F.col("rn") <= offset + page_size))
    )


def paginate_keyset(
    df: DataFrame,
    key: str,
    page_size: int,
    after_key=None,
) -> DataFrame:
    """Keyset (seek-method) pagination — the 100 TB-safe variant.

    ``WHERE key > after_key ORDER BY key LIMIT page_size``: the range
    predicate is pushed down to the scan (partition/row-group pruning),
    the sort is a per-partition top-k + driver merge of page_size rows —
    no global shuffle, no full materialization.
    """
    out = df
    if after_key is not None:
        out = out.filter(F.col(key) > F.lit(after_key))
    return out.orderBy(key).limit(page_size)
