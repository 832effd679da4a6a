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
    key: str | Sequence[str],
    page_size: int,
    after_key=None,
) -> DataFrame:
    """Keyset (seek-method) pagination — the 100 TB-safe variant.

    ``WHERE (keys...) > (after...) ORDER BY keys LIMIT page_size``:
    the seek predicate is pushed down to the scan (partition /
    row-group pruning on the leading key), the sort is a
    per-partition top-k + driver merge of page_size rows
    (TakeOrderedAndProject) — no global shuffle, no single-partition
    window, no full materialization.

    ``key`` may be a composite (several columns forming the page's
    total order); ``after_key`` is then the last row of the previous
    page as a tuple in the same column order, compared
    LEXICOGRAPHICALLY — ``(k1 > a1) OR (k1 = a1 AND k2 > a2) OR …``.
    A redundant ``k1 >= a1`` conjunct is added so the disjunction
    (which columnar sources can't push) still prunes at the scan via
    the leading key's range — the same implied-dispatch trick the
    open-now predicate uses."""
    keys = [key] if isinstance(key, str) else list(key)
    out = df
    if after_key is not None:
        after = (list(after_key)
                 if isinstance(after_key, (list, tuple)) else [after_key])
        if len(after) != len(keys):
            raise ValueError(
                f"after_key has {len(after)} values for {len(keys)} "
                "order keys"
            )
        cond = None
        eqs = None
        for k, a in zip(keys, after):
            gt = F.col(k) > F.lit(a)
            branch = gt if eqs is None else (eqs & gt)
            cond = branch if cond is None else (cond | branch)
            eq = F.col(k) == F.lit(a)
            eqs = eq if eqs is None else (eqs & eq)
        out = out.filter((F.col(keys[0]) >= F.lit(after[0])) & cond)
    return out.orderBy(*keys).limit(page_size)
