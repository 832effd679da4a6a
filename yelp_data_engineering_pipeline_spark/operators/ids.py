"""Dense surrogate-id assignment (SURVEY.md §2.5 W3, §7 hard point 4).

Two implementations with identical results:

- ``dense_ids_window`` — row_number over a global window. Simple, but
  the window is a SINGLE partition: fine for dimension-sized outputs,
  a straggler for fact-scale tables.
- ``dense_ids`` — the scalable two-phase scheme:

    1. range-repartition by the natural key (ordered partitions),
    2. count rows per partition (tiny driver-side collect, one row per
       partition), prefix-sum the counts into offsets,
    3. row_number within each partition + broadcast offset.

  Every stage is distributed; the only global structure is the
  n_partitions-row offset table. Ids depend only on the global key
  order, not on where Spark draws range boundaries, so results are
  deterministic run-to-run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dense_ids_window(df: DataFrame, *order_cols: str, id_col: str = "id") -> DataFrame:
    w = Window.orderBy(*order_cols)
    return df.withColumn(id_col, F.row_number().over(w).cast("bigint"))


def dense_ids_with_total(
    df: DataFrame, *order_cols: str, id_col: str = "id", num_partitions: int | None = None
) -> tuple[DataFrame, int]:
    """:func:`dense_ids` plus the total row count (already known from the
    per-partition count collect — no extra job for callers that need n,
    e.g. percent_rank/cume_dist)."""
    cols = [F.col(c) for c in order_cols]
    parted = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions is not None
        else df.repartitionByRange(*cols)
    ).withColumn("_pid", F.spark_partition_id())
    # MUST persist: range partitioning samples boundaries per action —
    # without this, the count job and the id job can draw different
    # boundaries and the offsets silently mismatch the final layout.
    # Tracked so harness loops can release it after materialization
    # (cache.release_tracked).
    from ..cache import tracked_persist

    parted = tracked_persist(parted)

    counts = parted.groupBy("_pid").count().orderBy("_pid").collect()
    offsets = {}
    acc = 0
    for r in counts:
        offsets[r["_pid"]] = acc
        acc += r["count"]
    offset_df = parted.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()] or [(0, 0)], "_pid int, _off long"
    )

    w = Window.partitionBy("_pid").orderBy(*cols)
    out = (
        parted.join(F.broadcast(offset_df), "_pid", "left")
        .withColumn(id_col, (F.row_number().over(w) + F.coalesce(F.col("_off"), F.lit(0))).cast("bigint"))
        .drop("_pid", "_off")
    )
    return out, acc


def dense_ids(
    df: DataFrame, *order_cols: str, id_col: str = "id", num_partitions: int | None = None
) -> DataFrame:
    """Dense bigint ids 1..n in ``order_cols`` order, computed without a
    single-partition window. Requires ``order_cols`` to be a total order
    (add a tiebreak column if not unique)."""
    out, _ = dense_ids_with_total(
        df, *order_cols, id_col=id_col, num_partitions=num_partitions
    )
    return out


def _floordiv(a: Column, b: int) -> Column:
    """Exact integer floor-division of a non-negative long Column by a
    positive int, without `div` (needs a named column) or bare double
    division (float floor can misround near integer quotients):
    (a - a % b) / b divides exactly, so the IEEE result IS the integer.
    """
    return ((a - a % F.lit(b)) / F.lit(b)).cast("long")


def ntile_from_rank(rank: Column, n: int, k: int) -> Column:
    """SQL-standard NTILE(k) computed from a global rank (1..n) with
    pure integer arithmetic — the companion to the two-phase rank
    scheme, so equi-depth tiling never needs a single-partition window.

    NTILE semantics: the first ``n % k`` tiles hold ``n//k + 1`` rows,
    the rest ``n//k`` (NOT the even-spread ``floor((r-1)*k/n)+1``
    closed form, which disagrees whenever k does not divide n).
    """
    q, r = divmod(n, k)
    if q == 0:  # fewer rows than tiles: tile == rank
        return rank.cast("int")
    big = r * (q + 1)  # rows covered by the n%k larger tiles
    return (
        F.when(rank <= F.lit(big), _floordiv(rank - 1, q + 1))
        .otherwise(F.lit(r) + _floordiv(rank - F.lit(big) - 1, q))
        + 1
    ).cast("int")


def ntile_from_rank_col(rank: Column, n: Column, k: int) -> Column:
    """:func:`ntile_from_rank` with the total row count ``n`` as a
    COLUMN instead of a driver-side int (r14) — the same SQL-standard
    NTILE arithmetic expressed lazily, so callers that carry n on each
    row (the lazy grid scheme below) never run an eager count job.
    Integer-exact: q/r/big are bigint expressions; the q == 0 branch
    (fewer rows than tiles) is a per-row CASE arm, and CaseWhen
    evaluates arms lazily so the q-divisor arithmetic never executes
    when q == 0 (ANSI-safe)."""
    nn = n.cast("long")
    q = ((nn - nn % F.lit(k)) / F.lit(k)).cast("long")
    r = nn % F.lit(k)
    big = r * (q + 1)

    def fdiv(a: Column, b: Column) -> Column:
        return ((a - a % b) / b).cast("long")

    return (
        F.when(q == 0, rank.cast("long"))
        .when(rank <= big, fdiv(rank.cast("long") - 1, q + 1) + 1)
        .otherwise(r + fdiv(rank.cast("long") - big - 1, q) + 1)
    ).cast("int")


def rank_histogram_grid_lazy(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    cell_shift: int = 16,
    id_col: str = "_rank",
    n_col: str = "_n",
) -> DataFrame:
    """:func:`rank_histogram_grid` with the offsets AND the total row
    count kept JVM-side (r14): the per-cell counts frame takes a
    running-sum window for the exclusive prefix (``_off``) and an
    unbounded-frame sum for the total (``n_col``), then broadcast-joins
    back — no driver collect, no eager job, ONE action end-to-end for
    callers like window_rank_distribution. Ranks and totals are
    bit-identical to the eager scheme (same integer arithmetic over the
    same grid)."""
    cents = F.floor(F.col(value_col) * 100).cast("long")
    tagged = df.withColumn("_cell", F.shiftright(cents, cell_shift))
    counts = tagged.groupBy("_cell").agg(F.count(F.lit(1)).alias("_cnt"))
    wcum = Window.orderBy("_cell").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.orderBy("_cell").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = counts.select(
        "_cell",
        F.coalesce(F.sum("_cnt").over(wcum), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(wall).alias(n_col),
    )
    w = Window.partitionBy("_cell").orderBy(value_col, tiebreak_col)
    return (
        tagged.join(F.broadcast(offs), "_cell", "left")
        .withColumn(
            id_col,
            (F.row_number().over(w) + F.coalesce(F.col("_off"), F.lit(0))).cast("bigint"),
        )
        .drop("_cell", "_off")
    )


def dense_ids_grid_long(
    df: DataFrame, *order_cols: str, id_col: str = "id", cell_shift: int = 16
) -> DataFrame:
    """:func:`dense_ids` semantics (dense bigint ids 1..n in
    ``order_cols`` order) for frames whose LEADING order column is a
    non-negative integer — one eager job instead of two (r13,
    guide §1.2 fewer passes).

    The range-repartition scheme must run a boundary-SAMPLE job (a full
    scan of the input pipeline), persist the shuffled frame (sampled
    boundaries are action-nondeterministic), then run the count job —
    two eager scans of the input per call, serialized at
    plan-construction time. Quantizing the leading key to a fixed grid
    (``cell = key >> cell_shift``) is deterministic, so no sample, no
    persist, no unpersist churn — and (r14, VERDICT r13 next-6) the
    per-cell prefix sum now stays JVM-side: the counts frame (input
    rows / 2^cell_shift — bounded) takes a running-sum window ordered
    by ``_cell`` and broadcast-joins back, so NOTHING is collected to
    the driver and the whole id assignment plans lazily — zero eager
    jobs; the caller's action materializes the counts subtree as a
    broadcast build. Ordering by (cell, *order_cols) equals
    (*order_cols) because shift-right is monotone on non-negative keys.

    Scale: with dense surrogate leading keys (the star-schema child
    case) cells are uniformly filled; 2^cell_shift rows/cell bounds the
    per-task window state, and the cell count grows with the data, so
    the window is never global. Skewed/unbounded/string keys keep
    :func:`dense_ids`.

    Ids are identical to :func:`dense_ids` by construction (both are
    the unique total order's row number); goldens and the DuckDB
    oracle sweep pin it.
    """
    lead = order_cols[0]
    cell = F.shiftright(F.col(lead).cast("long"), cell_shift)
    tagged = df.withColumn("_cell", cell)
    offset_df = _cell_offsets(tagged)
    w = Window.partitionBy("_cell").orderBy(*order_cols)
    return (
        tagged.join(F.broadcast(offset_df), "_cell", "left")
        .withColumn(
            id_col,
            (F.row_number().over(w) + F.coalesce(F.col("_off"), F.lit(0))).cast(
                "bigint"
            ),
        )
        .drop("_cell", "_off")
    )


def _cell_offsets(tagged: DataFrame) -> DataFrame:
    """(_cell, _off) prefix-sum offsets of the per-cell row counts,
    fully lazy (r14): a running-sum window ORDERED by ``_cell`` over
    the counts frame — bounded at rows/2^cell_shift, so the
    single-partition window is over the tiny aggregate, never the
    data — replaces the driver-side collect + createDataFrame. The
    exclusive prefix (rowsBetween unboundedPreceding → -1) is NULL for
    the first cell; coalesce pins it to 0, matching the old collect
    loop's acc=0 seed exactly."""
    counts = tagged.groupBy("_cell").agg(F.count(F.lit(1)).alias("_cnt"))
    wcum = Window.orderBy("_cell").rowsBetween(Window.unboundedPreceding, -1)
    return counts.select(
        "_cell", F.coalesce(F.sum("_cnt").over(wcum), F.lit(0)).alias("_off")
    )


def rank_histogram_grid(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    cell_shift: int = 16,
    id_col: str = "_rank",
) -> tuple[DataFrame, int]:
    """Global dense rank by ``(value, tiebreak)`` in TWO jobs, for
    bounded-domain numeric values — the cheaper sibling of
    :func:`dense_ids_with_total`.

    The range-repartition scheme above must SAMPLE boundaries (hidden
    extra job) and then PERSIST the shuffled frame, because sampled
    boundaries are action-nondeterministic. Quantizing the value to a
    fixed integer grid removes both: ``cell = cents >> cell_shift`` is
    deterministic, so the count job and the rank job agree by
    construction — no persist, no sampling, no unpersist churn.

      job 1: per-cell counts (map-combined groupBy over <= domain/2^shift
             cells) -> prefix-sum offsets on the driver (bounded rows);
      job 2: per-cell row_number (hash-partitioned window) + offset.

    Trade-off vs dense_ids: cells are fixed-width, so heavily skewed
    value distributions concentrate rows in few cells (range sampling
    adapts; the grid does not) — callers with unbounded/skewed domains
    keep using dense_ids. ``value_col`` rides a cents grid internally;
    ordering by (cell, value, tiebreak) equals (value, tiebreak)
    because floor-to-cents is monotone.
    """
    cents = F.floor(F.col(value_col) * 100).cast("long")
    cell = F.shiftright(cents, cell_shift)
    tagged = df.withColumn("_cell", cell)
    counts = tagged.groupBy("_cell").count().orderBy("_cell").collect()
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r["_cell"], acc))
        acc += r["count"]
    offset_df = tagged.sparkSession.createDataFrame(
        offsets or [(0, 0)], "_cell long, _off long"
    )
    w = Window.partitionBy("_cell").orderBy(value_col, tiebreak_col)
    out = (
        tagged.join(F.broadcast(offset_df), "_cell", "left")
        .withColumn(
            id_col,
            (F.row_number().over(w) + F.coalesce(F.col("_off"), F.lit(0))).cast("bigint"),
        )
        .drop("_cell", "_off")
    )
    return out, acc
