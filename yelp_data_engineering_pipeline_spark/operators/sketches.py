"""Count-min sketch heavy hitters (extension, BASELINE.json text
analysis family).

A count-min sketch is a fixed-size (d x w) integer matrix: cell
(seed, bucket) counts every token whose seeded hash lands in that
bucket; a token's frequency estimate is the MIN over its d cells
(always an over-estimate, never under). The whole point at 100 TB:

- The sketch build is ``groupBy(seed, bucket).count()`` — partial
  aggregation makes every map task emit at most d*w rows regardless of
  corpus size, and merging partial sketches IS cell-wise addition,
  which is exactly what the shuffle-side hash aggregate does. The
  shuffle carries O(d*w * n_partitions) rows, not O(tokens).
- Estimation touches only the candidate keys: d broadcast joins of the
  (tiny, <= d*w rows) sketch against the candidate set. Here the
  candidates are the corpus's distinct words (so the catalog entry can
  also report the exact count next to the estimate); a production
  pipeline threads candidates from a sample or a prior round instead
  of enumerating the key space.

Hashing is md5-derived on both engines (seed || '|' || token), so the
DuckDB oracle reproduces bucket assignment bit-for-bit; all outputs
are BIGINT — no float ever reaches the result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..tables import load
from .textstats import whitespace_tokens

CMS_D = 4  # hash rows (seeds)
CMS_W = 256  # buckets per row


def cms_bucket(token: Column, seed: int, w: int = CMS_W) -> Column:
    """Deterministic bucket: first 16 bits of md5(seed|token), mod w."""
    h = F.md5(F.concat(F.lit(f"{seed}|"), token))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % w


def cms_build(tokens_df: DataFrame, d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Build the (seed, bucket) -> cnt sketch from a `word` column.

    One explode to d rows per token, then a single hash aggregate; the
    map-side combine collapses each task's contribution to <= d*w rows
    before the shuffle.
    """
    seeded = tokens_df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        cms_bucket(F.col("word"), s, w).alias("bucket"),
                    )
                    for s in range(d)
                ]
            )
        ).alias("sb")
    )
    return seeded.groupBy(
        F.col("sb.seed").alias("seed"), F.col("sb.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(candidates: DataFrame, sketch: DataFrame, d: int = CMS_D,
                 w: int = CMS_W) -> DataFrame:
    """Annotate a `word` candidate set with the CMS estimate `est_n`.

    d broadcast joins against the <= d*w-row sketch; `least` of the d
    cell counts is the classic CMS point query.
    """
    out = candidates
    for s in range(d):
        cell = sketch.filter(F.col("seed") == s).select(
            F.col("bucket").alias(f"b{s}"), F.col("cnt").alias(f"cnt{s}")
        )
        out = out.withColumn(f"b{s}", cms_bucket(F.col("word"), s, w)).join(
            F.broadcast(cell), f"b{s}", "left"
        )
    est = F.least(*[F.col(f"cnt{s}") for s in range(d)])
    return out.select("word", *candidates.columns[1:], est.alias("est_n"))


def cms_heavy_hitters(docs: DataFrame, k: int = 20, d: int = CMS_D,
                      w: int = CMS_W) -> DataFrame:
    """Top-k tokens by CMS estimate, with the exact count alongside.

    The exact count exists to surface estimation error in the result
    (est_n >= exact_n always); ranking is by estimate — what a
    sketch-only pipeline would see.
    """
    toks = docs.select(
        F.explode(whitespace_tokens(F.lower(F.col("text")))).alias("word")
    )
    sketch = cms_build(toks, d, w)
    exact = toks.groupBy("word").agg(F.count(F.lit(1)).alias("exact_n"))
    est = cms_estimate(exact, sketch, d, w)
    rk_w = Window.orderBy(F.col("est_n").desc(), F.col("word"))
    return (
        est.withColumn("rk", F.row_number().over(rk_w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("word", "est_n", "exact_n", "rk")
    )


def agg_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cms_heavy_hitters(load(spark, sf_dir, "documents"), k=20)


# --- DuckDB oracle ---------------------------------------------------------
# hex -> int nibble arithmetic (DuckDB has no conv()); 4 hex chars = 16 bits.
def _hex4_sql(expr: str) -> str:
    terms = [
        f"CAST((strpos('0123456789abcdef', substring({expr}, {1 + i}, 1)) - 1) AS BIGINT)"
        f" * {16 ** (3 - i)}"
        for i in range(4)
    ]
    return "(" + " + ".join(terms) + ")"


_CMS_BUCKET_SQL = (
    _hex4_sql("md5(CAST(seed AS VARCHAR) || '|' || word)") + f" % {CMS_W}"
)

_CMS_ORACLE = f"""
    WITH toks AS (
      SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0b\f\r]+'),
                    x -> x != '')) AS word
      FROM documents
    ),
    seeded AS (
      SELECT word, seed, {_CMS_BUCKET_SQL} AS bucket
      FROM toks CROSS JOIN (SELECT unnest(range({CMS_D})) AS seed)
    ),
    sketch AS (SELECT seed, bucket, COUNT(*) AS cnt FROM seeded GROUP BY 1, 2),
    exact AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS exact_n FROM toks GROUP BY 1),
    cells AS (
      SELECT e.word, e.exact_n, s.seed, s.cnt
      FROM exact e
      JOIN seeded sd ON sd.word = e.word AND sd.seed IN (0, 1, 2, 3)
      JOIN sketch s ON s.seed = sd.seed AND s.bucket = sd.bucket
      GROUP BY ALL
    ),
    est AS (
      SELECT word, CAST(MIN(cnt) AS BIGINT) AS est_n, MIN(exact_n) AS exact_n
      FROM cells GROUP BY word
    )
    SELECT word, est_n, exact_n, rk FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY est_n DESC, word) AS BIGINT) AS rk
      FROM est
    ) WHERE rk <= 20
"""

register("agg_countmin_topk", agg_countmin_topk, _CMS_ORACLE)


# --- Mergeable HLL distinct-count rollup (Spark DataSketches) ---------------

HLL_SHARDS = 8
HLL_TOL_NUM = 1  # gate: |est - exact| <= exact * 1/20 (5%)
HLL_TOL_DEN = 20


def hll_shard_rollup(
    events: DataFrame,
    group_col: str,
    key_col: str,
    shard_col: Column,
    n_shards: int = HLL_SHARDS,
) -> DataFrame:
    """Distinct-count rollup via MERGEABLE HLL sketches — the pattern
    that makes per-shard pre-aggregation possible at 100 TB, where a
    COUNT(DISTINCT) re-shuffles raw keys on every rollup:

    1. each shard (file, day, ingest batch) builds its own
       ``hll_sketch_agg`` — map-side partial aggregation, the shuffle
       carries one ~KB sketch per (group, shard), never raw keys;
    2. rollups of any shard subset are ``hll_union_agg`` — sketch
       union is associative/commutative, so daily→monthly→total
       cascades reuse stored shard sketches without touching data;
    3. the estimate is read with ``hll_sketch_estimate``.

    The entry emits the exact count NEXT TO an integer within-tolerance
    flag so correctness is externally checkable: the DuckDB oracle
    computes ``exact_keys``/``n_shards`` independently and expects
    ``est_within_5pct = 1`` for every group — an ACCURACY-GATE oracle
    (the sketch binary itself is not reproducible outside the
    DataSketches library, so the oracle verifies the estimate's error
    bound instead of its bits; a sketch drifting past 5% turns the row
    red). All output columns are integers — no float reaches the
    result.
    """
    base = events.select(
        F.col(group_col).alias("grp"),
        F.col(key_col).alias("key"),
        shard_col.alias("shard"),
    )
    shard_sk = base.groupBy("grp", "shard").agg(
        F.hll_sketch_agg("key").alias("sk")
    )
    merged = shard_sk.groupBy("grp").agg(
        F.hll_union_agg("sk").alias("sk"),
        F.count(F.lit(1)).cast("int").alias("n_shards"),
    )
    est = merged.select(
        "grp", "n_shards", F.hll_sketch_estimate("sk").alias("est")
    )
    exact = base.groupBy("grp").agg(
        F.countDistinct("key").cast("bigint").alias("exact_keys")
    )
    return (
        est.join(exact, "grp")
        .select(
            F.col("grp").alias(group_col),
            "exact_keys",
            "n_shards",
            (
                F.abs(F.col("est") - F.col("exact_keys")) * HLL_TOL_DEN
                <= F.col("exact_keys") * HLL_TOL_NUM
            )
            .cast("int")
            .alias("est_within_5pct"),
        )
        .orderBy(group_col)
    )


def agg_hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return hll_shard_rollup(
        ev, "event_type", "user_id", F.pmod("event_id", F.lit(HLL_SHARDS))
    )


_HLL_ORACLE = f"""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_keys,
           CAST(COUNT(DISTINCT event_id % {HLL_SHARDS}) AS INT) AS n_shards,
           1 AS est_within_5pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
"""

register("agg_hll_distinct_rollup", agg_hll_distinct_rollup, _HLL_ORACLE)


# --- Approx-percentile sketch audit (GK/KLL-style mergeable quantiles) ------

PCT_ACCURACY = 1000  # rank error <= n / accuracy


def approx_percentile_gate(
    events: DataFrame, group_col: str, value_cents: Column, order_tiebreak: str
) -> DataFrame:
    """Mergeable approximate quantiles next to their exact audit — the
    quantile analogue of ``hll_shard_rollup`` above.

    ``percentile_approx`` is Spark's mergeable quantile sketch: partial
    sketches combine associatively, so at 100 TB per-partition partials
    shuffle as fixed-size summaries instead of re-sorting raw values.
    The EXACT side (a per-group sort) exists only to AUDIT the sketch —
    production rollups would carry the sketch alone.

    Quantile definition is pinned engine-neutrally (never an engine's
    own quantile_disc/percentile, whose index conventions differ):
    the exact q-quantile is the value at 1-based position
    floor((n-1)·q) + 1 under (value, tiebreak) order. Values are
    floor(value·100) cents BIGINTs; the within-gate flags compare
    integer value distance against the exact inter-decile span
    (|approx − exact|·10 ≤ p90 − p10), so the whole output is integer
    and the DuckDB oracle (exact quantiles + expected flags = 1) is an
    accuracy gate: a sketch drifting past a tenth of the spread turns
    the row red.
    """
    base = events.select(
        F.col(group_col).alias("grp"),
        F.col(order_tiebreak).alias("tb"),
        value_cents.alias("vc"),
    ).filter(F.col("vc").isNotNull())
    w = Window.partitionBy("grp").orderBy("vc", "tb")
    ranked = base.select(
        "grp",
        "vc",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("n"),
    )
    exact = ranked.groupBy("grp").agg(
        *[
            F.max(
                F.when(
                    F.col("rn") == F.expr(f"((n - 1) * {num}) div {den}") + 1,
                    F.col("vc"),
                )
            ).alias(f"exact_p{name}")
            for name, num, den in (("10", 1, 10), ("50", 1, 2), ("90", 9, 10))
        ]
    )
    approx = base.groupBy("grp").agg(
        F.percentile_approx("vc", [0.1, 0.5, 0.9], PCT_ACCURACY).alias("ap")
    )
    span = F.col("exact_p90") - F.col("exact_p10")
    out = exact.join(approx, "grp")
    for i, name in enumerate(("10", "50", "90")):
        out = out.withColumn(
            f"ok_p{name}",
            (
                F.abs(F.col("ap")[i] - F.col(f"exact_p{name}")) * 10 <= span
            ).cast("int"),
        )
    return out.select(
        F.col("grp").alias(group_col),
        "exact_p10",
        "exact_p50",
        "exact_p90",
        "ok_p10",
        "ok_p50",
        "ok_p90",
    ).orderBy(group_col)


def agg_approx_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return approx_percentile_gate(
        ev, "event_type", F.floor(F.col("value") * 100).cast("bigint"), "event_id"
    )


_PCT_ORACLE = """
    WITH base AS (
      SELECT event_type AS grp, event_id AS tb,
             CAST(FLOOR(value * 100) AS BIGINT) AS vc
      FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT grp, vc,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY vc, tb) AS rn,
             COUNT(*) OVER (PARTITION BY grp) AS n
      FROM base
    )
    SELECT grp AS event_type,
           MAX(CASE WHEN rn = ((n - 1) * 1) // 10 + 1 THEN vc END) AS exact_p10,
           MAX(CASE WHEN rn = ((n - 1) * 1) // 2 + 1 THEN vc END) AS exact_p50,
           MAX(CASE WHEN rn = ((n - 1) * 9) // 10 + 1 THEN vc END) AS exact_p90,
           1 AS ok_p10, 1 AS ok_p50, 1 AS ok_p90
    FROM ranked
    GROUP BY grp
    ORDER BY event_type
"""

register("agg_approx_percentile_gate", agg_approx_percentile_gate, _PCT_ORACLE)


# ---------------------------------------------------------------------------
# Exact-distinct bitmap registers (the exact-count sibling of HLL)
# ---------------------------------------------------------------------------


def bitmap_distinct(df: DataFrame, group_cols: list[str], id_col: str) -> DataFrame:
    """EXACT distinct count of a dense integer id per group via 64-bit
    bitmap registers — the roaring-bitmap idea expressed as two hash
    aggregates (no sketch error, unlike HLL; no per-group hash set,
    unlike COUNT DISTINCT's expand).

    Why this shape at 100 TB: ``COUNT(DISTINCT id)`` forces Spark to
    keep every distinct id in the aggregation hash map (or expand to a
    two-phase distinct) — shuffle and state are O(distinct ids). The
    bitmap form packs 64 ids into one BIGINT register keyed by
    ``(group, id div 64)``:

    - map-side partial ``bit_or`` collapses each task's contribution
      to at most one row per touched register — the shuffle carries
      O(groups x id_range/64) longs, 64x fewer than distinct ids, and
      registers MERGE by ``bit_or`` (commutative monoid), so partial
      aggregation does all the work;
    - the final ``sum(bit_count(mask))`` is exact — a bitmap register
      is the degenerate-precision end of the HLL spectrum
      (hll_shard_rollup above trades exactness for O(1) state when the
      id space is unbounded; bitmaps win when ids are dense, e.g.
      dictionary-encoded user/doc surrogate keys).

    The id must be a nonnegative integer (surrogate-key domain).
    NULL ids count as no id — matching ``COUNT(DISTINCT)``'s null-skip
    (ADVICE r6): a NULL id yields a NULL block/bit, ``bit_or`` of an
    all-NULL register is NULL, ``sum`` skips it, and the final
    ``coalesce(.., 0)`` turns an all-NULL group into 0 rather than
    NULL — the group row itself is preserved (no pre-filter, so a
    group whose ids are ALL null still appears, as it does under
    COUNT DISTINCT).
    """
    reg = df.select(
        *group_cols,
        F.expr(f"`{id_col}` div 64").alias("_blk"),
        # shiftleft needs a column shift amount — SQL form (the Python
        # wrapper only takes an int literal)
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(`{id_col}` % 64 AS INT))").alias("_bit"),
    )
    masks = reg.groupBy(*group_cols, "_blk").agg(F.bit_or("_bit").alias("_mask"))
    return masks.groupBy(*group_cols).agg(
        F.coalesce(F.sum(F.bit_count("_mask")), F.lit(0))
        .cast("bigint")
        .alias("n_distinct")
    )


def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type, bitmap-register formulation
    (user_id is a dense nonnegative surrogate key)."""
    ev = load(spark, sf_dir, "events")
    return bitmap_distinct(ev, ["event_type"], "user_id").withColumnRenamed(
        "n_distinct", "n_distinct_users"
    )


# The oracle is the INDEPENDENT formulation (native COUNT DISTINCT),
# not a SQL transliteration of the register dataflow — a register bug
# cannot cancel out.
register(
    "agg_bitmap_distinct",
    agg_bitmap_distinct,
    """
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_users
    FROM events GROUP BY event_type
    """,
)


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — the bottom-k sibling of HLL
# ---------------------------------------------------------------------------

KMV_K = 64
_KMV_DENOM = 16**8 + 1  # u = (h+1)/(2^32+1) in (0,1) — sampling.py convention


def kmv_distinct_estimate(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = KMV_K
) -> DataFrame:
    """Distinct-count estimate per group from the k minimum hash values:
    if distinct values hash to i.i.d. uniforms, the k-th smallest u_k
    estimates density and  D ≈ (k-1)/u_k  (Bar-Yossef et al. 2002,
    "Counting distinct elements in a data stream" — unbiased for the
    (k-1)/u_k form). Exact when the group has < k distinct values (the
    sketch holds them all — reported via n_kept < k).

    Why this shape at 100 TB: the sketch state is a bounded bottom-k
    SET of hashes, mergeable by union+trim (the same bottom-k monoid as
    reservoir_per_group's selection — sampling.py), so partial states
    flow through map-side combine; here the bottom-k is planned as a
    WindowGroupLimit (rank <= k prunes per map task before the
    shuffle). Unlike HLL's fixed 2^p registers, precision scales as
    1/sqrt(k) with EXACT small groups for free; unlike COUNT DISTINCT,
    state never exceeds k hashes. md5-derived uniforms keep the oracle
    bit-identical (same integer hash → same IEEE division → same
    estimate, no approximation slack needed in the differential).
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("kmv|"), F.col("_v").cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    u = (h + F.lit(1)).cast("double") / F.lit(float(_KMV_DENOM))
    distinct_u = (
        df.select(*group_cols, F.col(value_col).alias("_v"))
        .distinct()
        .select(*group_cols, u.alias("_u"))
    )
    w = Window.partitionBy(*group_cols).orderBy("_u")
    ranked = distinct_u.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= k
    )
    return ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.when(
            F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
        )
        .otherwise(F.lit(float(k - 1)) / F.max("_u"))
        .alias("distinct_est"),
    )


def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated vs exact distinct users per event type (the estimate is
    deterministic, so the differential is exact — and the exact count
    rides along as the honesty column)."""
    ev = load(spark, sf_dir, "events")
    est = kmv_distinct_estimate(ev, ["event_type"], "user_id")
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_exact")
    )
    return est.join(exact, "event_type").select(
        "event_type", "n_kept", F.round("distinct_est", 4).alias("distinct_est"), "n_exact"
    )


def _kmv_hex8_sql(expr: str) -> str:
    terms = [
        f"CAST((strpos('0123456789abcdef', substring({expr}, {1 + i}, 1)) - 1) AS BIGINT)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


register(
    "agg_kmv_distinct",
    agg_kmv_distinct,
    f"""
    WITH du AS (
      SELECT DISTINCT event_type, user_id FROM events
    ),
    uu AS (
      SELECT event_type,
             ({_kmv_hex8_sql("md5('kmv|' || CAST(user_id AS VARCHAR))")} + 1)
               / {float(16**8 + 1)!r} AS u
      FROM du
    ),
    ranked AS (
      SELECT event_type, u,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY u) AS rk
      FROM uu
    ),
    kept AS (SELECT event_type, u FROM ranked WHERE rk <= {KMV_K}),
    est AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_kept,
             CASE WHEN COUNT(*) < {KMV_K} THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE {float(KMV_K - 1)!r} / MAX(u) END AS distinct_est
      FROM kept GROUP BY event_type
    ),
    exact AS (
      SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY event_type
    )
    SELECT e.event_type, e.n_kept, ROUND(e.distinct_est, 4) AS distinct_est, x.n_exact
    FROM est e JOIN exact x USING (event_type)
    """,
)


# ---------------------------------------------------------------------------
# KMV set-operation estimates (distinct intersection from two sketches)
# ---------------------------------------------------------------------------


def kmv_intersection_estimate(
    a: DataFrame, b: DataFrame, value_col: str, k: int = KMV_K
) -> DataFrame:
    """Estimated |distinct(A) ∩ distinct(B)| from the two sides'
    bottom-k sketches alone (Beyer et al. 2007, SIGMOD — "On synopses
    for distinct-value estimation under multiset operations"): the
    union sketch M = bottom-k(S_A ∪ S_B) estimates the union density,
    and the fraction ρ of M's members present in BOTH input sketches
    scales it:  |A∩B| ≈ ρ · (k-1)/u_k.

    This is the whole point of KMV over HLL for set algebra: the
    sketch members are actual hashed KEYS, so intersections (which HLL
    can only get by inclusion-exclusion, error-amplified) come from
    set operations on k-row synopses. Everything after the two
    bottom-k passes touches ≤ k rows per side. Exact when the UNION
    has < k distinct values (both sketches then hold their full sets).
    Returns one row: (n_both_in_sketch BIGINT, inter_est DOUBLE,
    unrounded). tests/test_sketches.py holds the INDEPENDENT-
    formulation truth (vs an exact distinct-intersect) — the catalog
    oracle is a hash-parity twin by design (VERDICT r6 next-2).
    """
    du = (
        a.select(F.lit(0).alias("_side"), F.col(value_col).alias("_v"))
        .unionByName(b.select(F.lit(1).alias("_side"), F.col(value_col).alias("_v")))
        .distinct()
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("kmv|"), F.col("_v").cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    u = (h + F.lit(1)).cast("double") / F.lit(float(_KMV_DENOM))
    uu = du.select("_side", "_v", u.alias("u"))
    # per-side bottom-k plans as WindowGroupLimit: each map task prunes
    # to its local top-k before the shuffle (same shape as
    # kmv_distinct_estimate above)
    w = Window.partitionBy("_side").orderBy("u", "_v")
    sketches = uu.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    sa = sketches.filter(F.col("_side") == 0).select("_v", "u")
    sb = sketches.filter(F.col("_side") == 1).select("_v", "u")
    m = sa.unionByName(sb).distinct().orderBy("u", "_v").limit(k)
    both = m.join(sa.select("_v"), "_v", "left_semi").join(
        sb.select("_v"), "_v", "left_semi"
    )
    stats = m.agg(
        F.count(F.lit(1)).alias("m_n"), F.max("u").alias("u_k")
    ).crossJoin(both.agg(F.count(F.lit(1)).alias("n_both")))
    return stats.select(
        F.col("n_both").cast("bigint").alias("n_both_in_sketch"),
        (
            F.col("n_both")
            / F.col("m_n")
            * F.when(F.col("m_n") < k, F.col("m_n").cast("double")).otherwise(
                F.lit(float(k - 1)) / F.col("u_k")
            )
        ).alias("inter_est"),
    )


def agg_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """click ∩ purchase distinct users via kmv_intersection_estimate
    (A=click, B=purchase over user_id); exact count rides along as the
    honesty column. Deterministic md5 uniforms → the estimate itself
    is differential-checked, not just bounded."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id")
    est = kmv_intersection_estimate(clicks, purchases, "user_id", KMV_K)
    exact = (
        clicks.distinct()
        .join(purchases.distinct(), "user_id", "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    )
    return est.crossJoin(exact).select(
        "n_both_in_sketch",
        F.round("inter_est", 4).alias("inter_est"),
        "n_exact",
    )


register(
    "agg_kmv_intersection",
    agg_kmv_intersection,
    f"""
    WITH du AS (
      SELECT DISTINCT event_type, user_id FROM events
      WHERE event_type IN ('click', 'purchase')
    ),
    uu AS (
      SELECT event_type, user_id,
             ({_kmv_hex8_sql("md5('kmv|' || CAST(user_id AS VARCHAR))")} + 1)
               / {float(16**8 + 1)!r} AS u
      FROM du
    ),
    sk AS (
      SELECT event_type, user_id, u FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY u, user_id) AS rk
        FROM uu
      ) WHERE rk <= {KMV_K}
    ),
    a AS (SELECT user_id, u FROM sk WHERE event_type = 'click'),
    b AS (SELECT user_id, u FROM sk WHERE event_type = 'purchase'),
    m AS (
      SELECT DISTINCT user_id, u FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
      ORDER BY u, user_id LIMIT {KMV_K}
    ),
    inboth AS (
      SELECT m.user_id FROM m
      WHERE m.user_id IN (SELECT user_id FROM a)
        AND m.user_id IN (SELECT user_id FROM b)
    ),
    stats AS (
      SELECT (SELECT COUNT(*) FROM m) AS m_n,
             (SELECT MAX(u) FROM m) AS u_k,
             (SELECT COUNT(*) FROM inboth) AS n_both
    ),
    exact AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM (
        SELECT user_id FROM du GROUP BY user_id HAVING COUNT(*) = 2
      )
    )
    SELECT CAST(n_both AS BIGINT) AS n_both_in_sketch,
           ROUND(n_both / m_n * (CASE WHEN m_n < {KMV_K} THEN CAST(m_n AS DOUBLE)
                                      ELSE {float(KMV_K - 1)!r} / u_k END), 4)
             AS inter_est,
           n_exact
    FROM stats CROSS JOIN exact
    """,
)
