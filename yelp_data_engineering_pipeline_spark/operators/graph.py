"""Connected components over an edge list — near-dup CLUSTER assignment.

The dedup pipeline (dedup.py) stops at verified pairs; an actual corpus
dedup needs to transitively close those pairs into clusters and keep one
canonical document per cluster. Reference analogue: the reference's
dedup surface is pairwise only (web_scraping.py distinct-set build at
:518-519 is the closest op) — cluster closure is part of the extension
surface this engine adds for LLM-corpus prep.

Algorithm: iterative hash-min label propagation. Every node starts
labelled with its own id; each round it takes the min of its own and
its neighbours' labels; converged when no label changes. Rounds needed
= graph diameter, which for near-dup clusters is tiny (dup groups are
near-cliques: LSH banding links most members directly, so diameter is
1-3 in practice). Each round is ONE shuffle (join on node) + ONE
hash-agg — both keyed, both AQE-coalesced.

Scale notes (100 TB):
- The per-round lineage is truncated with ``localCheckpoint`` —
  without it, iteration k replays all k-1 previous joins per action and
  the plan grows without bound. On a real cluster with lost-executor
  risk, swap for reliable ``checkpoint()`` against a checkpoint dir.
- For adversarial graphs with large diameter (long chains — NOT the
  near-dup shape), the O(log n)-round alternative is large-star /
  small-star (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC'14). Min-propagation is preferred here because dup
  clusters are near-cliques and each round is cheaper (no edge
  rewriting).
- The convergence check is a driver-side scalar count per round — an
  O(1) result per job, not a collect of data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import tracked_persist
from ..plans.catalog import register
from ..tables import load
from .dedup import _MINHASH_ORACLE, minhash_lsh_pairs


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 25
) -> DataFrame:
    """(node, label) for every node in ``edges``; label = min node id of
    the node's connected component. Undirected: edges are symmetrized.
    Raises if not converged within ``max_iter`` rounds (diameter bound),
    rather than silently returning partial components."""
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s").isNotNull() & F.col("d").isNotNull())
    )
    sym = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    sym = tracked_persist(sym)  # re-joined every round; compute the pair pipeline once
    labels = (
        sym.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        # LAZY like the round checkpoints (r13): round 0's convergence
        # count materializes seed blocks + the sym persist in the same
        # job — the eager form paid one extra job for the same
        # truncation.
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        # labels is O(nodes): a sort-merge hint pins the keyed join — a
        # planner broadcast of a node-sized table dies at scale, and a
        # shuffle-hash build map can exhaust a small heap (both observed
        # at the 10× stress tier under a 1 GiB bare driver, round 4);
        # sort-merge spills gracefully.
        msgs = sym.join(labels.hint("merge"), sym["d"] == labels["node"]).select(
            F.col("s").alias("node"), "label", F.lit(False).alias("_self")
        )
        # ONE union-then-groupBy per round (r14, guide §2.4/§2.3): the
        # previous shape re-joined labels onto nbr_min — a second
        # sort-merge join and exchange per round. min(own ∪ neighbour
        # labels) is the identical recurrence as
        # least(label, coalesce(nbr_min, label)), and the groupBy's
        # map-side partial aggregation collapses messages before the
        # shuffle. Each node has exactly ONE self row (labels is keyed),
        # so min(label WHERE _self) recovers old_label for the
        # convergence test without the join.
        stepped = (
            labels.select("node", "label", F.lit(True).alias("_self"))
            .unionByName(msgs)
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                F.min(F.when(F.col("_self"), F.col("label"))).alias("old_label"),
            )
            # LAZY checkpoint + count = ONE action per round (r13): the
            # convergence count's full-partition scan materializes the
            # checkpoint blocks as a side effect.
            .localCheckpoint(eager=False)  # truncate iterative lineage
        )
        changed = stepped.filter(F.col("label") < F.col("old_label")).count()
        labels = stepped.select("node", "label")
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components: not converged in {max_iter} rounds")


def assign_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    algorithm: str = "propagation",
) -> DataFrame:
    """Every document gets (cluster_id, is_canonical): transitive
    closure of the near-dup ``pairs`` graph, singletons cluster with
    themselves, canonical = min-id member. `docs.filter(is_canonical)`
    IS the deduplicated corpus.

    ``algorithm``: "propagation" (default — cheapest per round, rounds
    = cluster diameter, the near-clique dup shape) or "star"
    (large-star/small-star, O(log n) rounds for chain-like pair graphs
    — e.g. containment chains from overlapping crawls)."""
    if algorithm == "star":
        labels, _ = connected_components_star(pairs, "doc_a", "doc_b")
    else:
        labels = connected_components(pairs, "doc_a", "doc_b")
    return (
        docs.select(id_col)
        .join(labels.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("label", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col("cluster_id") == F.col(id_col))
    )


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", jaccard_threshold=0.5)
    return assign_clusters(docs, pairs)


# Oracle: DuckDB recursive CTE. `reach` seeds every endpoint with itself
# and follows symmetric edges, so MIN(b) per node = the component's min
# id — identical semantics to converged min-propagation.
register(
    "dedup_clusters",
    dedup_clusters,
    f"""
    WITH RECURSIVE
    pairs AS (SELECT doc_a, doc_b FROM ({_MINHASH_ORACLE}) WHERE jaccard >= 0.5),
    edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(a, b) AS (
        SELECT s, s FROM edges
        UNION
        SELECT r.a, e.d FROM reach r JOIN edges e ON r.b = e.s
    ),
    labels AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a)
    SELECT d.doc_id,
           COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
           COALESCE(l.cluster_id, d.doc_id) = d.doc_id AS is_canonical
    FROM documents d LEFT JOIN labels l USING (doc_id)
    """,
)


# ---------------------------------------------------------------------------
# PageRank (fixed rounds, integer micro-units)
# ---------------------------------------------------------------------------


def pagerank(
    edges: DataFrame, src: str, dst: str, rounds: int = 3
) -> DataFrame:
    """PageRank over the symmetrized edge graph, fixed ``rounds``, all
    arithmetic in integer micro-units so the result is bit-reproducible
    across engines and shuffle orders (same discipline as clustering.py):

        r⁰ = 1_000_000 per node
        rᵏ = 150_000 + (85 · Σ_in (rᵏ⁻¹ ÷ deg)) ÷ 100     (÷ = floor)

    (d = 0.85 with a uniform per-node teleport term; dangling nodes
    cannot occur in a symmetrized graph — every node has deg ≥ 1.)

    On the near-dup pair graph this scores "hub" documents that sit in
    many overlapping duplicate neighbourhoods — a corpus diagnostic for
    boilerplate and template families.

    Scale shape per round: one join of ranks onto edges (both keyed by
    node — co-partitioned after the first shuffle) + one hash-agg;
    lineage truncated per round with localCheckpoint like
    connected_components. Degrees are computed once and persisted.
    """
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s").isNotNull() & F.col("d").isNotNull())
    )
    sym = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    sym = tracked_persist(sym)
    deg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    # deg is STATIC across rounds — join it onto the edge set ONCE and
    # persist, instead of re-running the sym⋈deg sort-merge join inside
    # every round (r14, guide §2.4: the exchange and join were pure
    # per-round rework; rounds now join only the evolving ranks).
    sym_deg = tracked_persist(sym.join(deg.hint("merge"), "s"))
    ranks = deg.select(F.col("s").alias("node"), F.lit(1_000_000).cast("bigint").alias("r"))
    for _ in range(rounds):
        # deg/ranks are O(nodes) and must never broadcast (10× stress
        # tier OOM under a 1 GiB bare driver, round 4); sort-merge — not
        # shuffle_hash, whose per-partition build map also OOM'd the
        # bare heap — keeps every round a spill-safe keyed join.
        contrib = (
            sym_deg.join(ranks.withColumnRenamed("node", "s").hint("merge"), "s")
            .select(F.col("d").alias("node"), F.expr("r div deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            contrib.select(
                "node",
                (F.lit(150_000).cast("bigint") + F.expr("(85 * in_sum) div 100")).alias("r"),
            )
            # LAZY (r13): rounds are fixed-count (no convergence read),
            # so nothing needs a per-round action — the caller's single
            # action computes all rounds once, each checkpoint
            # truncating lineage when its blocks materialize; the eager
            # form paid one scheduling round trip per round.
            .localCheckpoint(eager=False)
        )
    return ranks


def doc_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", jaccard_threshold=0.2)
    return pagerank(pairs, "doc_a", "doc_b").withColumnRenamed("node", "doc_id")


def _pagerank_oracle(rounds: int = 3) -> str:
    parts = [
        f"""
    WITH pairs AS (SELECT doc_a, doc_b FROM ({_MINHASH_ORACLE}) WHERE jaccard >= 0.2),
    edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    deg AS (SELECT s, COUNT(*) AS deg FROM edges GROUP BY s),
    r0 AS (SELECT s AS node, CAST(1000000 AS BIGINT) AS r FROM deg)"""
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f""",
    r{k} AS (
      SELECT e.d AS node,
             CAST(150000 + (85 * SUM(r.r // g.deg)) // 100 AS BIGINT) AS r
      FROM edges e JOIN deg g USING (s) JOIN r{k - 1} r ON r.node = e.s
      GROUP BY e.d
    )"""
        )
    parts.append(f"\n    SELECT node AS doc_id, r FROM r{rounds}")
    return "".join(parts)


register("graph_pagerank", doc_pagerank, _pagerank_oracle())


# ---------------------------------------------------------------------------
# Triangle counting / global clustering coefficient
# ---------------------------------------------------------------------------


def triangle_stats(pairs: DataFrame) -> DataFrame:
    """Triangle census of an undirected pair graph: nodes, edges, wedges
    (open triplets, from degrees — pure integer math), triangles (closed
    triplets via the oriented two-join), and the global clustering
    coefficient 3T/W.

    Scale: edges are oriented u<v so each triangle is generated exactly
    once; the wedge→closure join is the standard distributed algorithm
    (MapReduce triangle counting, Suri & Vassilvitskii WWW'11). At whale
    degrees, switch orientation to (degree, id) ordering so high-degree
    hubs fan out to sqrt work; id ordering is fine at near-dup-graph
    densities. The coefficient division happens ONCE on identical BIGINT
    operands in both engines.
    """
    e = (
        pairs.select(
            F.least("doc_a", "doc_b").alias("u"), F.greatest("doc_a", "doc_b").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    e = tracked_persist(e)  # feeds three join sides + the degree union
    sym = e.select(F.col("u").alias("s")).unionAll(e.select(F.col("v").alias("s")))
    deg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("dg"))
    nodes_wedges = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("dg * (dg - 1) div 2")).cast("bigint").alias("n_wedges"),
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(e3, (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        nodes_wedges.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.when(
                F.col("n_wedges") > 0,
                (F.lit(3.0) * F.col("n_triangles")) / F.col("n_wedges"),
            ).alias("global_clustering"),
        )
    )


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", jaccard_threshold=0.5)
    return triangle_stats(pairs)


register(
    "graph_triangles",
    graph_triangles,
    f"""
    WITH p AS (SELECT doc_a, doc_b FROM ({_MINHASH_ORACLE}) WHERE jaccard >= 0.5),
    e AS (SELECT DISTINCT least(doc_a, doc_b) AS u, greatest(doc_a, doc_b) AS v
          FROM p WHERE doc_a <> doc_b),
    sym AS (SELECT u AS s FROM e UNION ALL SELECT v FROM e),
    deg AS (SELECT s, COUNT(*) AS dg FROM sym GROUP BY s),
    nw AS (SELECT COUNT(*) AS n_nodes,
                  CAST(SUM(dg * (dg - 1) // 2) AS BIGINT) AS n_wedges
           FROM deg),
    ne AS (SELECT COUNT(*) AS n_edges FROM e),
    tri AS (SELECT COUNT(*) AS n_triangles
            FROM e e1
            JOIN e e2 ON e1.v = e2.u
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
    SELECT n_nodes, n_edges, n_wedges, n_triangles,
           CASE WHEN n_wedges > 0
                THEN (3.0 * n_triangles) / n_wedges END AS global_clustering
    FROM nw, ne, tri
    """,
)


# ---------------------------------------------------------------------------
# Large-star / small-star connected components (O(log n) rounds)
# ---------------------------------------------------------------------------


def connected_components_star(
    edges: DataFrame, src: str, dst: str, max_iter: int = 40
) -> tuple[DataFrame, int]:
    """Alternating large-star / small-star connected components
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the adversarial-diameter scale path this module's
    docstring promises next to min-propagation.

    Min-propagation needs diameter-many rounds: a 10M-node chain is 10M
    shuffles. Star operations rewire the edge set itself — large-star
    hangs every larger neighbor off the neighborhood min, small-star
    collapses the smaller neighbors — and converge in O(log n) rounds
    on ANY topology (measured: 1000-node chain = 11 rounds vs 999).
    Each half-round is two keyed shuffles (a groupBy for neighborhood
    minima + the rewire join), no collect_list — hub neighborhoods
    never materialize as arrays.

    Returns (labels, rounds): (node, label) with label = component min,
    plus the round count so callers/tests can assert the log bound.
    Equivalence with min-propagation is hypothesis-tested
    (tests/test_properties.py)."""
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s").isNotNull() & F.col("d").isNotNull())
        .filter(F.col("s") != F.col("d"))
    )
    cur = (
        e.select(F.least("s", "d").alias("s"), F.greatest("s", "d").alias("d"))
        .distinct()
        # LAZY (r13): round 0's symmetric-difference count materializes
        # the seed edge set in the same job — see connected_components.
        .localCheckpoint(eager=False)
    )

    def _sym(pairs: DataFrame) -> DataFrame:
        return pairs.union(pairs.select(F.col("d").alias("s"), F.col("s").alias("d")))

    def _large_star(pairs: DataFrame) -> DataFrame:
        g = _sym(pairs)
        m = g.groupBy(F.col("s").alias("u")).agg(
            F.least(F.min("d"), F.first("s")).alias("m")
        )
        return (
            g.filter(F.col("d") > F.col("s"))
            .join(m.hint("merge"), F.col("s") == F.col("u"))
            .select(F.col("d").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .select(F.least("a", "b").alias("s"), F.greatest("a", "b").alias("d"))
            .distinct()
        )

    def _small_star(pairs: DataFrame) -> DataFrame:
        g = _sym(pairs)
        le = g.filter(F.col("d") < F.col("s"))
        m = le.groupBy(F.col("s").alias("u")).agg(
            F.least(F.min("d"), F.first("s")).alias("m")
        )
        rewired = (
            le.join(m.hint("merge"), F.col("s") == F.col("u"))
            .select(F.col("d").alias("a"), F.col("m").alias("b"))
        )
        self_edges = m.select(F.col("u").alias("a"), F.col("m").alias("b"))
        return (
            rewired.union(self_edges)
            .filter(F.col("a") != F.col("b"))
            .select(F.least("a", "b").alias("s"), F.greatest("a", "b").alias("d"))
            .distinct()
        )

    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # ONE action per round (r13, same lazy-checkpoint trick as
        # min-propagation): the symmetric-difference count unions both
        # exceptAll directions into a single job, and its scan of nxt
        # materializes the lazy checkpoint. Previously 3 jobs/round
        # (eager checkpoint + two directional counts); delta == 0 iff
        # both directions are empty either way.
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        delta = nxt.exceptAll(cur).unionAll(cur.exceptAll(nxt)).count()
        cur = nxt
        if delta == 0:
            break
    else:
        raise RuntimeError(f"connected_components_star: not converged in {max_iter}")
    # converged edge set is a forest of stars rooted at component minima
    labels = (
        _sym(cur)
        .groupBy(F.col("s").alias("node"))
        .agg(F.least(F.min("d"), F.first("s")).alias("label"))
    )
    return labels, rounds


# ---------------------------------------------------------------------------
# Incremental connected components (batch edge additions)
# ---------------------------------------------------------------------------


def cc_incremental(old_labels: DataFrame, new_edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Fold a batch of NEW edges into existing component labels without
    re-clustering the corpus: the old state is compressed to its star
    edges (node → label, one edge per non-root node — the converged
    form), unioned with the new batch, and re-closed. Components
    untouched by the batch cost one pass over their star edges (depth
    1, so min-propagation converges on them immediately); only
    components the new edges actually bridge do real work.

    This is the daily-ingest shape for near-dup clustering at 100 TB:
    state carried between runs is O(nodes) star edges, not the
    original pair graph, and labels stay canonical (component min) so
    downstream keep-or-drop decisions never flip for unaffected docs.
    Equivalence with full recomputation is hypothesis-tested and
    oracle-checked (the catalog entry's oracle IS the full closure)."""
    star = old_labels.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias("s"), F.col("label").alias("d")
    )
    batch = new_edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    return connected_components(star.unionByName(batch), "s", "d")


def dedup_clusters_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_clusters' semantics via the incremental path: pairs whose
    BOTH endpoints sit in the first 90% of doc ids are the 'existing'
    corpus (clustered first); pairs touching the newest 10% arrive as
    the new batch. The oracle is the FULL transitive closure — a green
    row proves the star-compressed incremental fold loses nothing."""
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", jaccard_threshold=0.5)
    pairs = tracked_persist(pairs)
    mx = docs.agg((F.max("doc_id") * 9 / 10).cast("bigint").alias("cut"))
    with_cut = pairs.crossJoin(F.broadcast(mx))
    old = with_cut.filter((F.col("doc_a") <= F.col("cut")) & (F.col("doc_b") <= F.col("cut")))
    new = with_cut.filter((F.col("doc_a") > F.col("cut")) | (F.col("doc_b") > F.col("cut")))
    old_labels = connected_components(old, "doc_a", "doc_b")
    labels = cc_incremental(old_labels, new, "doc_a", "doc_b")
    return (
        docs.select("doc_id")
        .join(labels.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("label", F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col("cluster_id") == F.col("doc_id"))
    )


# Oracle: the FULL closure (same SQL as dedup_clusters) — equality with
# it is exactly the incremental path's correctness claim.
register(
    "dedup_clusters_incremental",
    dedup_clusters_incremental,
    f"""
    WITH RECURSIVE
    pairs AS (SELECT doc_a, doc_b FROM ({_MINHASH_ORACLE}) WHERE jaccard >= 0.5),
    edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(a, b) AS (
        SELECT s, s FROM edges
        UNION
        SELECT r.a, e.d FROM reach r JOIN edges e ON r.b = e.s
    ),
    labels AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a)
    SELECT d.doc_id,
           COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
           COALESCE(l.cluster_id, d.doc_id) = d.doc_id AS is_canonical
    FROM documents d LEFT JOIN labels l USING (doc_id)
    """,
)
