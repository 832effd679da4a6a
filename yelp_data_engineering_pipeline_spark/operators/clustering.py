"""Distributed k-means (Lloyd's algorithm, fixed round count) over an
embedding column — cluster seeding / corpus bucketing for training-data
pipelines. Extension surface (BASELINE.json); the reference engine has
no clustering operator.

Scale design (the MLlib KMeans shape):
- Centroids are k × d numbers — bounded by definition — so each round
  collects them to the driver and re-broadcasts them as literals into a
  per-row assignment expression: assignment is ZERO-shuffle, the only
  shuffle per round is the bounded (k × d)-key centroid aggregate.
- Rounds are FIXED (not converge-tested): a production run picks a
  round budget up front, which also keeps the plan deterministic and
  lets the DuckDB oracle unroll the exact same rounds.

Exactness (the property that makes an oracle possible at all):
- quantize once: q = floor(v · 10⁴) — int per (vector, dim);
- a round-r centroid is the exact rational Σq / (10⁴·n);
- scaled squared distance Σ_dim (q·n − Σq)² is pure bigint arithmetic
  (order-exact under any shuffle), and the comparable distance is ONE
  exact-int double division — bit-identical across engines;
- ties (rare but possible) break by cluster id ascending on both sides.

Seeding: cluster c starts at the vector with vec_id = c (c < k) —
deterministic and engine-portable, where sampled inits are not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..partitioning import widen_for_compute
from ..plans.catalog import register
from ..tables import load

_Q = 10_000  # quantization grid: floor(v * _Q)


def _quantize(vec_col: str) -> Column:
    return F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * _Q).cast("bigint")
    )


def _nearest(q_vec: Column, cents: dict[int, tuple[int, list[int]]]) -> Column:
    """argmin_c ‖v − centroid_c‖² as a per-row expression over literal
    centroids; ties break on cluster id (struct comparison order)."""
    from ..functions.bulklit import lit_long_array

    dists = []
    for c in sorted(cents):
        n, sums = cents[c]
        diff_sq = F.zip_with(
            q_vec,
            # one parsed expression per centroid (bulklit, r13) — the
            # per-value F.lit form paid a py4j round trip per sum; the
            # bigint arithmetic below is unchanged (q is bigint, so
            # every term promoted to bigint under the old int-or-long
            # element literals too)
            lit_long_array(sums),
            lambda q, s: (q * F.lit(n) - s) * (q * F.lit(n) - s),
        )
        num = F.aggregate(diff_sq, F.lit(0).cast("bigint"), lambda acc, x: acc + x)
        dists.append(
            F.struct(
                (num.cast("double") / F.lit(float(_Q * _Q * n * n))).alias("dist"),
                F.lit(c).alias("cluster"),
            )
        )
    return F.array_min(F.array(*dists))["cluster"]


def _round_agg(base: DataFrame, cents: dict[int, tuple[int, list[int]]]) -> DataFrame:
    """One Lloyd round's centroid aggregate with the cluster id computed
    INSIDE the posexplode projection — ``_nearest`` is a pure per-row
    expression over ``q``, so nothing forces the r12 shape (assign,
    then JOIN the assignment back to the N×d posexploded matrix — a
    SortMergeJoin hash-exchanging N + N×d corpus rows per round;
    VERDICT r12 what's-wrong #1). Fused, the only network traffic per
    round is the map-side-combined (cluster, dim) partial aggregate:
    k×d rows per task, never the corpus. The bigint sums are
    order-free, so the result is bit-identical to the joined form."""
    # two CHAINED narrow projections, not one: a generator in the same
    # select as _nearest makes Spark rewrite the argmin's inner struct
    # and drop its field names (FIELD_NOT_FOUND on `cluster`). Codegen
    # collapses both into one stage — still zero shuffle below the agg.
    return (
        base.select(_nearest(F.col("q"), cents).alias("cluster"), "q")
        .select("cluster", F.posexplode("q").alias("dim", "qv"))
        .groupBy("cluster", "dim")
        .agg(F.sum("qv").alias("sum_q"), F.count(F.lit(1)).alias("n"))
    )


def _membership_summary(
    base: DataFrame, cents: dict[int, tuple[int, list[int]]]
) -> DataFrame:
    """Final (cluster, n_members, sum_q_total) rollup, same fusion: the
    per-vector q-checksum collapses to ONE row per vector before the
    k-key aggregate (count ≡ the old countDistinct — ids are unique,
    one base row each), so not even the ×d explosion is shuffled."""
    return (
        base.select(
            _nearest(F.col("q"), cents).alias("cluster"),
            F.aggregate(
                "q", F.lit(0).cast("bigint"), lambda acc, x: acc + x
            ).alias("_qsum"),
        )
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("_qsum").alias("sum_q_total"),
        )
    )


def kmeans(
    emb: DataFrame, id_col: str, vec_col: str, k: int = 10, rounds: int = 3
) -> DataFrame:
    """Run ``rounds`` Lloyd iterations; returns one row per surviving
    cluster: (cluster, n_members, sum_q_total) where sum_q_total is the
    integer checksum Σ_dim Σ_members q — an exact, order-independent
    fingerprint of the final partition."""
    base = emb.select(F.col(id_col).alias("vec_id"), _quantize(vec_col).alias("q"))

    # seed: cluster c = the single vector vec_id = c (array order IS
    # dim order, so unpacking q matches the old flat-row collection)
    seed_rows = base.filter(F.col("vec_id") < k).collect()
    cents: dict[int, tuple[int, list[int]]] = {
        int(r["vec_id"]): (1, [int(x) for x in r["q"]])
        for r in seed_rows
    }

    # the summary reports the LAST round's assignment — i.e. the
    # codebook that round assigned with, NOT the post-round rebuild
    # (the pre-fusion code returned the loop's final lazy `assigned`,
    # which had captured the pre-rebuild centroids; the unrolled
    # DuckDB oracle ends at assign_N over cent_{N-1} the same way)
    last_cents = cents
    for _ in range(rounds):
        last_cents = cents
        agg = _round_agg(base, cents).collect()  # k × d rows — bounded
        cents = {}
        n_by_c: dict[int, int] = {}
        sums_by_c: dict[int, dict[int, int]] = {}
        for r in agg:
            n_by_c[r["cluster"]] = r["n"]
            sums_by_c.setdefault(r["cluster"], {})[r["dim"]] = r["sum_q"]
        for c, sums in sums_by_c.items():
            cents[c] = (n_by_c[c], [sums[d] for d in range(len(sums))])

    return _membership_summary(base, last_cents)


def emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmeans(
        widen_for_compute(load(spark, sf_dir, "embeddings")), "vec_id", "embedding"
    )


def _kmeans_oracle(k: int = 10, rounds: int = 3) -> str:
    """Unrolled Lloyd rounds as chained CTEs, mirroring kmeans()."""
    parts = [
        """
    WITH ex AS (
      SELECT vec_id,
             unnest(list_transform(range(len(embedding)),
                                   i -> {'dim': i, 'v': embedding[i+1]})) AS u
      FROM embeddings
    ),
    flat AS (
      SELECT vec_id, CAST(u.dim AS INT) AS dim,
             CAST(FLOOR(CAST(u.v AS DOUBLE) * 10000) AS BIGINT) AS qv
      FROM ex
    ),
    cent0 AS (
      SELECT vec_id AS cluster, dim, qv AS sum_q, CAST(1 AS BIGINT) AS n
      FROM flat WHERE vec_id < %(k)d
    )""" % {"k": k}
    ]
    for r in range(1, rounds + 1):
        parts.append(
            """,
    dist%(r)d AS (
      SELECT f.vec_id, c.cluster,
             CAST(SUM((f.qv * c.n - c.sum_q) * (f.qv * c.n - c.sum_q)) AS BIGINT) AS num,
             ANY_VALUE(c.n) AS n
      FROM flat f JOIN cent%(p)d c USING (dim)
      GROUP BY f.vec_id, c.cluster
    ),
    assign%(r)d AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (
                 PARTITION BY vec_id
                 ORDER BY CAST(num AS DOUBLE) / (100000000.0 * n * n), cluster
               ) AS rk
        FROM dist%(r)d
      ) WHERE rk = 1
    ),
    cent%(r)d AS (
      SELECT a.cluster, f.dim, CAST(SUM(f.qv) AS BIGINT) AS sum_q, COUNT(*) AS n
      FROM assign%(r)d a JOIN flat f USING (vec_id)
      GROUP BY a.cluster, f.dim
    )"""
            % {"r": r, "p": r - 1}
        )
    parts.append(
        """
    SELECT a.cluster,
           COUNT(DISTINCT a.vec_id) AS n_members,
           CAST(SUM(f.qv) AS BIGINT) AS sum_q_total
    FROM assign%(r)d a JOIN flat f USING (vec_id)
    GROUP BY a.cluster
    """
        % {"r": rounds}
    )
    return "".join(parts)


register("emb_kmeans", emb_kmeans, _kmeans_oracle())
