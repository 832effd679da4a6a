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


# --- Temperature-based source mixing (alpha-sampling allocator) -------------

MIX_BUDGET = 1000
# alpha = 1/2: weight each source by sqrt of its size — the standard
# temperature that upweights small sources without letting them dominate


def temperature_mix_quotas(
    docs: DataFrame, group_col: str, size_col: str, budget: int = MIX_BUDGET
) -> DataFrame:
    """Per-source sampling quotas under temperature-based mixing — the
    allocator behind multilingual/multi-source LLM data mixes (sample
    source i with probability ∝ size_i^alpha, alpha = 0.5 here): raw
    proportional sampling starves small sources, uniform sampling
    over-trains on them, sqrt is the conventional compromise.

    Everything after the one per-source aggregate is INTEGER math so
    both engines agree bit-for-bit:
    - weight_i = floor(sqrt(size_i)) — IEEE 754 REQUIRES sqrt to be
      correctly rounded (unlike ln/exp, which drift between libm
      builds), so even the floor boundary is engine-exact;
    - base quota  = (budget * w_i) div W,  W = Σ w_i;
    - the leftover budget - Σ base goes to the largest integer
      remainders ((budget * w_i) mod W, ties by group) — the largest-
      remainder apportionment method, which guarantees Σ quota = budget
      exactly.

    Scale shape: one groupBy(source) aggregate (map-side combined),
    two 1-row broadcast totals, and a window over the SOURCE dimension
    (tens of rows at any corpus size) — per-doc data is touched once.
    """
    agg = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(size_col).cast("bigint").alias("grp_size"),
    )
    agg = agg.withColumn(
        "weight", F.floor(F.sqrt(F.col("grp_size").cast("double"))).cast("bigint")
    )
    tot = agg.agg(F.sum("weight").cast("bigint").alias("w_total"))
    alloc = (
        agg.crossJoin(F.broadcast(tot))
        .withColumn("base_quota", F.expr(f"({budget} * weight) div w_total"))
        .withColumn("rem", (F.lit(budget) * F.col("weight")) % F.col("w_total"))
    )
    spent = alloc.agg(F.sum("base_quota").cast("bigint").alias("spent"))
    w = Window.orderBy(F.desc("rem"), F.asc("grp"))
    return (
        alloc.crossJoin(F.broadcast(spent))
        .withColumn("rk", F.row_number().over(w))
        .withColumn(
            "quota",
            F.col("base_quota")
            + (F.col("rk") <= F.lit(budget) - F.col("spent")).cast("bigint"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "grp_size",
            "weight",
            "quota",
        )
        .orderBy(group_col)
    )


def prep_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return temperature_mix_quotas(docs, "source", "n_chars")


register(
    "prep_temperature_mix",
    prep_temperature_mix,
    f"""
    WITH agg AS (
      SELECT source AS grp,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS grp_size
      FROM documents GROUP BY source
    ),
    weighted AS (
      SELECT *, CAST(FLOOR(SQRT(CAST(grp_size AS DOUBLE))) AS BIGINT) AS weight
      FROM agg
    ),
    tot AS (SELECT CAST(SUM(weight) AS BIGINT) AS w_total FROM weighted),
    alloc AS (
      SELECT *, ({MIX_BUDGET} * weight) // w_total AS base_quota,
             ({MIX_BUDGET} * weight) % w_total AS rem
      FROM weighted CROSS JOIN tot
    ),
    spent AS (SELECT CAST(SUM(base_quota) AS BIGINT) AS spent FROM alloc)
    SELECT grp AS source, n_docs, grp_size, weight,
           CAST(base_quota + (CASE WHEN rk <= {MIX_BUDGET} - spent THEN 1 ELSE 0 END) AS BIGINT) AS quota
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, grp ASC) AS rk
      FROM alloc CROSS JOIN spent
    )
    ORDER BY source
    """,
)


# --- Per-group uniform reservoir sample (hash-keyed, deterministic) ---------


def reservoir_per_group(
    df: DataFrame, group: str, row_id: str, k: int, salt: str = "rs"
) -> DataFrame:
    """Exactly min(k, |group|) UNIFORM rows per group, deterministic
    and coordination-free.

    The classic reservoir (Vitter's Algorithm R) is a sequential
    single-pass structure — useless across executors. Its output
    distribution, though, is just "the k smallest rows by an i.i.d.
    uniform key", and a hash-derived key gives that without any RNG
    state: every row computes ``md5(salt|id)`` map-side, the per-group
    bottom-k win. Deterministic across runs AND across repartitioning
    (same property as es_rank_key above, uniform instead of weighted).

    Scale: the ``row_number <= k`` filter lets Spark plan a
    WindowGroupLimit — each map task keeps only its local bottom-k per
    group BEFORE the shuffle, so the exchange carries O(groups x k x
    n_partitions) rows, not the corpus. Incremental corpora: a new row
    displaces the current max-key row iff its key is smaller — the
    standard bottom-k sketch merge, no resampling of old rows.
    """
    key = F.md5(F.concat(F.lit(f"{salt}|"), F.col(row_id).cast("string")))
    w = Window.partitionBy(group).orderBy(key.asc(), F.col(row_id))
    return (
        df.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
    )


def prep_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4 uniformly-sampled docs per source (stable eval-set draw)."""
    docs = load(spark, sf_dir, "documents")
    return reservoir_per_group(docs, "source", "doc_id", k=4).select(
        "source", "doc_id", "rk"
    )


register(
    "prep_reservoir_per_group",
    prep_reservoir_per_group,
    """
    SELECT source, doc_id, rk FROM (
      SELECT source, doc_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('rs|' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS BIGINT) AS rk
      FROM documents
    ) WHERE rk <= 4
    """,
)
