"""Consistent weighted sampling (extension, BASELINE.json corpus-prep
family): Efraimidis–Spirakis A-ES bottom-k.

Draw k documents per group with probability proportional to a weight
column, WITHOUT coordination: each row computes its own exponential
rank key ``-ln(u)/w`` from a hash-derived uniform ``u`` and the
bottom-k keys per group win. Equivalent to sorting by ``u^(1/w)``
descending (Efraimidis & Spirakis 2006), but the log form keeps the
magnitudes sane for md5-derived uniforms.

Why this shape at 100 TB:
- Selection is embarrassingly parallel — the key is per-row map-side
  arithmetic from the row's own id and weight; the only shuffle is the
  per-group bottom-k (a window, or per-partition top-k + merge when k
  is small). No global sort, no driver-side state, no second pass.
- CONSISTENT: the "randomness" is md5(doc_id), so re-running on a
  re-partitioned / incrementally-grown corpus re-selects the same
  survivors for unchanged rows — the property that makes sampled eval
  sets stable across pipeline runs.

Determinism across engines: u is built from exact integer arithmetic
(both engines divide the same 32-bit integer by 2^32+1 — IEEE division
is correctly rounded everywhere), and the only libm call (ln) is
rounded to 9 decimals before ranking with a doc_id tie-break, so a
sub-ulp libm difference cannot reorder rows. The float key itself
never reaches the output — integer columns only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..tables import load

_U_DENOM = 16**8 + 1  # 2^32 + 1: u = (h+1)/denom lands in (0, 1)


def es_rank_key(row_id: Column, weight: Column, salt: str = "ws") -> Column:
    """Exponential rank key -ln(u)/w, u hash-derived from the row id."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}|"), row_id.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    u = (h + F.lit(1)).cast("double") / F.lit(float(_U_DENOM))
    return F.round(-F.log(u) / weight.cast("double"), 9)


def weighted_sample(df: DataFrame, group: str, row_id: str, weight: str,
                    k: int) -> DataFrame:
    """Bottom-k rows per group by the A-ES key: P(select) ∝ weight."""
    w = Window.partitionBy(group).orderBy(
        es_rank_key(F.col(row_id), F.col(weight)).asc(), F.col(row_id)
    )
    return (
        df.filter(F.col(weight) > 0)
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
    )


def prep_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5 docs per source, selection probability ∝ document length."""
    docs = load(spark, sf_dir, "documents")
    return weighted_sample(docs, "source", "doc_id", "n_chars", k=5).select(
        "source", "doc_id", "n_chars", "rk"
    )


def _hex8_sql(expr: str) -> str:
    terms = [
        f"CAST((strpos('0123456789abcdef', substring({expr}, {1 + i}, 1)) - 1) AS BIGINT)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


_ES_KEY_SQL = (
    "ROUND(-ln(("
    + _hex8_sql("md5('ws|' || CAST(doc_id AS VARCHAR))")
    + f" + 1) / {float(_U_DENOM)!r}) / CAST(n_chars AS DOUBLE), 9)"
)

register(
    "prep_weighted_sample",
    prep_weighted_sample,
    f"""
    SELECT source, doc_id, n_chars, rk FROM (
      SELECT source, doc_id, n_chars,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY {_ES_KEY_SQL}, doc_id
             ) AS BIGINT) AS rk
      FROM documents WHERE n_chars > 0
    ) WHERE rk <= 5
    """,
)
