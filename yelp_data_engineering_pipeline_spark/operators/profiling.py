"""Table profiling — per-column null / distinct / bounds statistics in
ONE pass over the data (the ops tool you run before trusting a new
100 TB drop; also the input to broadcast-vs-shuffle and salting
decisions, see salting.key_skew_profile for the per-key variant).

Shape: a single aggregate computes every column's registers
simultaneously (one scan, no per-column jobs); the wide 1-row result is
then unpivoted driver-side into (column, stat) rows — O(#columns), not
data. count_distinct over multiple columns in one agg is exact here;
swap any column to approx_count_distinct when its cardinality at full
scale makes exact distinct-count state too heavy (documented trade).

Bounds are emitted only for integer columns: double/string rendering
differs across engines (engine-parity note in MEMORY: Spark `1.0E-4`
vs DuckDB `0.0001`), and the profile's job is schema-shaped sanity, not
value display.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType

from ..plans.catalog import register
from ..tables import load


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_int, max_int) per
    requested column; min/max are NULL for non-integer types."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
        if isinstance(df.schema[c].dataType, (IntegerType, LongType)):
            aggs.append(F.min(c).cast("long").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("long").alias(f"{c}__max"))
    wide = df.agg(*aggs)
    rows = []
    for c in cols:
        has_bounds = f"{c}__min" in wide.columns
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                (F.col(f"{c}__min") if has_bounds else F.lit(None).cast("long")).alias("min_int"),
                (F.col(f"{c}__max") if has_bounds else F.lit(None).cast("long")).alias("max_int"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("s")).select("s.*")


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_columns(
        load(spark, sf_dir, "orders"),
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
    )


def _col_profile_sql(c: str, bounds: bool) -> str:
    mn = f"CAST(MIN({c}) AS BIGINT)" if bounds else "CAST(NULL AS BIGINT)"
    mx = f"CAST(MAX({c}) AS BIGINT)" if bounds else "CAST(NULL AS BIGINT)"
    return f"""
      SELECT '{c}' AS column, COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
             {mn} AS min_int, {mx} AS max_int
      FROM orders"""


register(
    "profile_table",
    profile_orders,
    " UNION ALL ".join(
        _col_profile_sql(c, b)
        for c, b in [
            ("o_orderkey", True),
            ("o_custkey", True),
            ("o_orderstatus", False),
            ("o_totalprice", False),
        ]
    ),
)


def profile_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus triage: volume, exact-dup rate, size and token
    mass — the table a curator reads to decide which sources to keep,
    re-crawl, or drop before spending dedup/similarity budget.
    One hash-agg over (source); ratios are single IEEE divisions of
    exact ints (bit-stable)."""
    doc = load(spark, sf_dir, "documents")
    agg = doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_unique"),
        F.sum("n_chars").alias("sum_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )
    return agg.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_unique").cast("bigint").alias("n_unique"),
        (F.lit(1.0) - F.col("n_unique") / F.col("n_docs")).alias("dup_ratio"),
        F.col("sum_chars").cast("bigint").alias("sum_chars"),
        (F.col("sum_chars") / F.col("n_docs")).alias("chars_per_doc"),
        F.col("n_langs").cast("bigint").alias("n_langs"),
    )


register(
    "profile_by_source",
    profile_by_source,
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT text) AS BIGINT) AS n_unique,
           1.0 - CAST(COUNT(DISTINCT text) AS DOUBLE) / COUNT(*) AS dup_ratio,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS chars_per_doc,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents
    GROUP BY source
    """,
)


# --- Distribution drift (chi-square, per-bin ledger) ------------------------

DRIFT_BIN_W = 64
DRIFT_BINS = 10


def source_drift(
    docs: DataFrame, probe_source: str, size_col: str = "n_chars"
) -> DataFrame:
    """Chi-square drift ledger of one source's length distribution
    against the rest of the corpus — the monitoring primitive that
    catches a crawler or upstream-dump change before it poisons a
    training mix. Emits the PER-BIN contribution table rather than the
    summed statistic: the sum of IEEE doubles over bins is
    accumulation-order-dependent across engines, while every per-bin
    term here is a fixed operand-order expression over exact integer
    counts — bit-identical, no rounding grid needed (the jaccard
    exact-ratio precedent). Downstream sums it (or reads the biggest
    terms directly, which is what an alert should show anyway).

    One groupBy(bin) over the corpus + a 1-row broadcast of the two
    totals; bins where the baseline is empty are excluded (chi-square
    is undefined there) — at 100 TB this is a metadata-sized query.
    """
    binned = docs.select(
        # `div` (integer floor division) on both engines: a double
        # division + int cast would TRUNCATE on Spark but ROUND on
        # DuckDB, shifting bin edges between engines
        F.least(
            F.expr(f"CAST({size_col} AS BIGINT) div {DRIFT_BIN_W}"),
            F.lit(DRIFT_BINS - 1).cast("bigint"),
        ).alias("bin"),
        (F.col("source") == probe_source).cast("int").alias("is_probe"),
    )
    agg = binned.groupBy("bin").agg(
        F.sum("is_probe").cast("bigint").alias("n_probe"),
        F.sum(1 - F.col("is_probe")).cast("bigint").alias("n_rest"),
    )
    tot = agg.agg(
        F.sum("n_probe").cast("bigint").alias("tot_probe"),
        F.sum("n_rest").cast("bigint").alias("tot_rest"),
    )
    e = F.col("n_rest") * F.col("tot_probe") / F.col("tot_rest")
    return (
        agg.crossJoin(F.broadcast(tot))
        .filter(F.col("n_rest") > 0)
        .select(
            "bin",
            "n_probe",
            "n_rest",
            e.alias("expected"),
            ((F.col("n_probe") - e) * (F.col("n_probe") - e) / e).alias("chi2_term"),
        )
        .orderBy("bin")
    )


def diag_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return source_drift(load(spark, sf_dir, "documents"), "src0")


register(
    "diag_source_drift",
    diag_source_drift,
    f"""
    WITH binned AS (
      SELECT LEAST(CAST(n_chars AS BIGINT) // {DRIFT_BIN_W}, {DRIFT_BINS - 1}) AS bin,
             CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is_probe
      FROM documents
    ),
    agg AS (
      SELECT bin,
             CAST(SUM(is_probe) AS BIGINT) AS n_probe,
             CAST(SUM(1 - is_probe) AS BIGINT) AS n_rest
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT CAST(SUM(n_probe) AS BIGINT) AS tot_probe,
             CAST(SUM(n_rest) AS BIGINT) AS tot_rest
      FROM agg
    )
    SELECT bin, n_probe, n_rest,
           n_rest * tot_probe / tot_rest AS expected,
           (n_probe - n_rest * tot_probe / tot_rest)
             * (n_probe - n_rest * tot_probe / tot_rest)
             / (n_rest * tot_probe / tot_rest) AS chi2_term
    FROM agg CROSS JOIN tot
    WHERE n_rest > 0
    ORDER BY bin
    """,
)


# --- Declarative data-quality expectations ----------------------------------


def diag_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite runner (the dbt-test / Great-Expectations
    shape): each rule is one aggregate over the table it guards, the
    output is the audit ledger a load gate consumes — (expectation,
    violations, passed). Rules here cover the five standard families:
    not-null, uniqueness, accepted-values, range, and referential
    integrity (an anti-join count, the only two-table rule).

    Scale: every rule is a map-side predicate count folded into ONE
    aggregate per table (a single pass over orders, one over
    lineitem, plus the FK anti-join) — adding a rule adds a column to
    an existing pass, not a new scan. All-integer output."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    def cnt(pred):  # violations = rows where the expectation FAILS
        return F.sum(pred.cast("long")).cast("bigint")

    o = orders.agg(
        cnt(F.col("o_custkey").isNull()).alias("orders_custkey_not_null"),
        cnt(~F.col("o_orderstatus").isin("F", "O", "P")).alias(
            "orders_status_accepted_values"
        ),
        cnt(~(F.col("o_totalprice") > 0)).alias("orders_totalprice_positive"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("orders_orderkey_unique"),
    )
    l = li.agg(
        cnt(~(F.col("l_quantity") > 0)).alias("lineitem_quantity_positive"),
        cnt(F.col("l_discount") > F.lit(0.5)).alias("lineitem_discount_sane"),
    )
    fk = (
        li.select("l_orderkey")
        .join(orders.select("o_orderkey"), li["l_orderkey"] == orders["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("lineitem_orderkey_fk"))
    )
    wide = o.crossJoin(F.broadcast(l)).crossJoin(F.broadcast(fk))
    rules = [
        "orders_custkey_not_null",
        "orders_status_accepted_values",
        "orders_totalprice_positive",
        "orders_orderkey_unique",
        "lineitem_quantity_positive",
        "lineitem_discount_sane",
        "lineitem_orderkey_fk",
    ]
    stacked = wide.selectExpr(
        "stack({}, {}) as (expectation, violations)".format(
            len(rules), ", ".join(f"'{r}', {r}" for r in rules)
        )
    )
    return stacked.select(
        "expectation",
        "violations",
        (F.col("violations") == 0).cast("int").alias("passed"),
    ).orderBy("expectation")


register(
    "diag_expectations",
    diag_expectations,
    """
    WITH o AS (
      SELECT CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orders_custkey_not_null,
             CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT) AS orders_status_accepted_values,
             CAST(SUM(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS BIGINT) AS orders_totalprice_positive,
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS orders_orderkey_unique
      FROM orders
    ),
    l AS (
      SELECT CAST(SUM(CASE WHEN NOT (l_quantity > 0) THEN 1 ELSE 0 END) AS BIGINT) AS lineitem_quantity_positive,
             CAST(SUM(CASE WHEN l_discount > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS lineitem_discount_sane
      FROM lineitem
    ),
    fk AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS lineitem_orderkey_fk
      FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    ),
    wide AS (SELECT * FROM o CROSS JOIN l CROSS JOIN fk)
    SELECT expectation, violations,
           CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS INT) AS passed
    FROM (
      SELECT 'orders_custkey_not_null' AS expectation, orders_custkey_not_null AS violations FROM wide
      UNION ALL SELECT 'orders_status_accepted_values', orders_status_accepted_values FROM wide
      UNION ALL SELECT 'orders_totalprice_positive', orders_totalprice_positive FROM wide
      UNION ALL SELECT 'orders_orderkey_unique', orders_orderkey_unique FROM wide
      UNION ALL SELECT 'lineitem_quantity_positive', lineitem_quantity_positive FROM wide
      UNION ALL SELECT 'lineitem_discount_sane', lineitem_discount_sane FROM wide
      UNION ALL SELECT 'lineitem_orderkey_fk', lineitem_orderkey_fk FROM wide
    )
    ORDER BY expectation
    """,
)
