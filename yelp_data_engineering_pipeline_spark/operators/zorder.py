"""Z-order (Morton) multi-dimensional layout — cluster a table so scans
filtered on EITHER of two keys prune most files.

A range-partition + sort on z = interleave(bits(x), bits(y)) gives
every file a bounded rectangle in (x, y) space, so parquet min/max
stats prune on both columns — single-column sort gives pruning on one
column only. This is the standard lakehouse OPTIMIZE ZORDER BY
technique, expressed as plain Spark: ``repartitionByRange(z) +
sortWithinPartitions(z)`` before write.

The z-value is built from literal shifts only (amounts are Python loop
constants), so it is a pure JVM integer expression — portable to the
DuckDB oracle as (x // 2^b % 2) * 2^(2b) arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..tables import load

_BITS = 16


def zvalue_cols(cols: list[Column], bits_each: int) -> Column:
    """Interleave the low ``bits_each`` bits of k columns: bit ``b`` of
    column ``i`` lands at position ``b*k + i`` (for k=2 this is exactly
    the classic even/odd Morton interleave). ``k * bits_each`` must fit
    a signed 64-bit z — callers size ``bits_each`` accordingly."""
    k = len(cols)
    terms = []
    for i, c in enumerate(cols):
        m = c.cast("long") % (1 << bits_each)
        for b in range(bits_each):
            terms.append(
                F.shiftleft(F.shiftright(m, b).bitwiseAND(F.lit(1)), b * k + i)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zvalue(x: Column, y: Column, bits: int = _BITS) -> Column:
    """Interleave the low ``bits`` of x (even positions) and y (odd)."""
    return zvalue_cols([x, y], bits)


def zorder_layout_cols(df: DataFrame, cols: list[str], n_files: int = 32) -> DataFrame:
    """The write-side OPTIMIZE ZORDER layout for ANY number of keys:
    range-partition by the k-way Morton z so each output file covers a
    bounded k-rectangle; sort within for row-group stats. One key
    degenerates to plain linear clustering (sort by the key itself).

    Each key is first RANGE-NORMALIZED into rank space
    (``(v - min) * 2^bits // span`` — exact integer floor via the
    pmod identity), with ``bits = min(16, 62 // k)`` so the interleave
    always fits a signed 64-bit z. Interleaving raw low bits instead
    WRAPS any key domain wider than the bit budget: every 2^bits-th
    key collides, so file "rectangles" span the whole domain and
    min/max pruning gets nothing — measured on the ×10 lineitem tier
    (21-bit orderkey), where the raw-bit layout produced zero file
    skipping. The normalization costs one min/max aggregate over the
    input (2k scalars to the driver) — the right trade inside OPTIMIZE
    ZORDER, which is already a whole-data rewrite."""
    if len(cols) == 1:
        c = cols[0]
        return (
            df.withColumn("_z", F.col(c).cast("long"))
            .repartitionByRange(n_files, "_z")
            .sortWithinPartitions("_z")
        )
    bits_each = min(_BITS, 62 // len(cols))
    aggs = [f(c) for c in cols for f in (F.min, F.max)]
    bounds = df.agg(*aggs).first()
    if bounds is None or any(bounds[2 * i] is None for i in range(len(cols))):
        z = zvalue_cols([F.col(c) for c in cols], bits_each)  # empty/all-null
    else:

        def bucket(col: str, lo, hi) -> "F.Column":
            span = max(int(hi) - int(lo), 0) + 1
            num = (F.col(col).cast("long") - F.lit(int(lo))) * F.lit(1 << bits_each)
            return ((num - F.pmod(num, F.lit(span))) / F.lit(span)).cast("long")

        z = zvalue_cols(
            [bucket(c, bounds[2 * i], bounds[2 * i + 1]) for i, c in enumerate(cols)],
            bits_each,
        )
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
    )


def zorder_layout(df: DataFrame, x: str, y: str, n_files: int = 32) -> DataFrame:
    """Two-key OPTIMIZE ZORDER (see :func:`zorder_layout_cols`)."""
    return zorder_layout_cols(df, [x, y], n_files)


def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evidence query: bucket lineitem by the top z bits and emit each
    bucket's (orderkey, partkey) bounding box — z-order makes BOTH
    spans bounded per bucket, which is exactly why file-level min/max
    stats can prune on either predicate."""
    li = load(spark, sf_dir, "lineitem")
    z = zvalue(F.col("l_orderkey"), F.col("l_partkey"))
    return (
        li.select(
            F.floor(z / (1 << 22)).cast("long").alias("z_bucket"),
            "l_orderkey",
            "l_partkey",
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_orderkey").alias("min_ok"),
            F.max("l_orderkey").alias("max_ok"),
            F.min("l_partkey").alias("min_pk"),
            F.max("l_partkey").alias("max_pk"),
        )
    )


def _interleave_sql(col: str, even: bool, bits: int = _BITS) -> str:
    terms = [
        f"(({col} % 65536) // {1 << b} % 2) * {1 << (2 * b + (0 if even else 1))}"
        for b in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


register(
    "layout_zorder",
    layout_zorder,
    f"""
    WITH z AS (
      SELECT {_interleave_sql('l_orderkey', True)}
             + {_interleave_sql('l_partkey', False)} AS zv,
             l_orderkey, l_partkey
      FROM lineitem
    )
    SELECT CAST(zv // {1 << 22} AS BIGINT) AS z_bucket,
           COUNT(*) AS n_rows,
           MIN(l_orderkey) AS min_ok, MAX(l_orderkey) AS max_ok,
           MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk
    FROM z GROUP BY 1
    """,
)
