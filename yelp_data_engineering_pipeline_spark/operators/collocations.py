"""Bigram collocation extraction over the corpus (PMI/lift scoring).

Training-corpus text op: surface word pairs that co-occur far more
often than their unigram frequencies predict — phrase mining and
tokenizer-merge candidate scoring (the same statistic BPE/WordPiece
merge steps rank by). lift = P(xy) / (P(x)·P(y)) =
cxy·M² / (N·cx·cy) over exact integer counts.

Parity: the score is emitted as FLOOR(lift·1000) computed by ONE
fixed left-associated double expression over exact integer aggregates
— per-row float math with an identical expression shape is bit-exact
across Spark and DuckDB (only cross-row float aggregation is
order-dependent; see the parity rules in plans/catalog.py).

Scale notes (100 TB): bigram/unigram counting is hash-groupBy with
map-side partial aggregation (one shuffle each). The bigram→unigram
count joins key on the vocabulary — large but Heaps-law-sublinear in
corpus size — and stay hash joins under AQE (NOT forced broadcast: a
web-scale vocab is 100M+ terms). Corpus totals M and N are 1-row
aggregates crossJoin-broadcast to the score projection. Bigrams are
built by zipping shifted slices — O(tokens) per row, no per-element
slice re-evaluation (PySpark has no CSE across higher-order-function
lambda boundaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..tables import load

_MIN_PAIR_COUNT = 20
_TOP_K = 50


def bigram_lift(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-bigram lift table: (bg, cxy, cx, cy, lift_milli)."""
    toks = docs.select(F.split(F.col(text_col), " ").alias("t")).withColumn(
        "n", F.size("t")
    )
    bg = toks.filter(F.col("n") >= 2).select(
        F.explode(
            F.zip_with(
                F.expr("slice(t, 1, n - 1)"),
                F.expr("slice(t, 2, n - 1)"),
                lambda x, y: F.concat_ws(" ", x, y),
            )
        ).alias("bg")
    )
    uni = docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
    unic = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    m_tot = uni.agg(F.count(F.lit(1)).alias("m"))
    bgc = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("cxy"))
    n_tot = bg.agg(F.count(F.lit(1)).alias("n_bg"))
    scored = (
        bgc.withColumn("x", F.element_at(F.split("bg", " "), 1))
        .withColumn("y", F.element_at(F.split("bg", " "), 2))
        .join(unic.select(F.col("w").alias("x"), F.col("c").alias("cx")), "x")
        .join(unic.select(F.col("w").alias("y"), F.col("c").alias("cy")), "y")
        .crossJoin(F.broadcast(m_tot))
        .crossJoin(F.broadcast(n_tot))
    )
    # ONE left-associated double expression — mirrored verbatim in the
    # oracle SQL below; do not refactor the operand order.
    lift = F.floor(
        F.col("cxy").cast("double") * F.col("m") * F.col("m") * F.lit(1000.0)
        / (F.col("n_bg").cast("double") * F.col("cx") * F.col("cy"))
    ).cast("bigint")
    return scored.select("bg", "cxy", "cx", "cy", lift.alias("lift_milli"))


def text_pmi_bigrams(spark, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    out = bigram_lift(docs)
    return (
        out.filter(F.col("cxy") >= _MIN_PAIR_COUNT)
        .orderBy(F.desc("lift_milli"), "bg")
        .limit(_TOP_K)
    )


register(
    "text_pmi_bigrams",
    text_pmi_bigrams,
    f"""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    uni AS (SELECT UNNEST(t) AS w FROM toks),
    unic AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
    mt AS (SELECT COUNT(*) AS m FROM uni),
    bgr AS (
      SELECT x || ' ' || y AS bg FROM (
        SELECT UNNEST(t[1:len(t)-1]) AS x, UNNEST(t[2:len(t)]) AS y
        FROM toks WHERE len(t) >= 2
      )
    ),
    bgc AS (SELECT bg, COUNT(*) AS cxy FROM bgr GROUP BY bg),
    nt AS (SELECT COUNT(*) AS n_bg FROM bgr)
    SELECT b.bg, b.cxy, ux.c AS cx, uy.c AS cy,
           CAST(FLOOR(CAST(b.cxy AS DOUBLE) * mt.m * mt.m * 1000.0
                / (CAST(nt.n_bg AS DOUBLE) * ux.c * uy.c)) AS BIGINT)
             AS lift_milli
    FROM bgc b
    JOIN unic ux ON ux.w = string_split(b.bg, ' ')[1]
    JOIN unic uy ON uy.w = string_split(b.bg, ' ')[2]
    CROSS JOIN mt CROSS JOIN nt
    WHERE b.cxy >= {_MIN_PAIR_COUNT}
    ORDER BY lift_milli DESC, bg
    LIMIT {_TOP_K}
    """,
)
