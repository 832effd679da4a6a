"""ANN-index maintenance ledger (VERDICT r10 next-4): incremental
change-feed refresh vs full rebuild under CDC churn.

Seeds a clustered embeddings ParquetMergeTable PARTITIONED BY an
ingest-epoch column (the date-partitioned layout a production
embeddings corpus has — per-key-immutable, so CoW merges prune to the
touched epochs), builds one IvfIndex whose assignment table shares the
partitioning, then applies ``batches`` churn commits: each inserts a
new epoch and updates/deletes keys from the last two epochs (recent
data churns — the access pattern the partitioning is designed for).
After every commit BOTH maintenance costs are measured on the same
corpus state:

- ``refresh_s``  — IvfIndex.refresh(): changes_at → re-assign churn →
  one partition-pruned keyed merge (O(commit churn));
- ``rebuild_s``  — IvfIndex.build() into a throwaway root: re-seed +
  re-assign + rewrite the WHOLE corpus (what per-query topk_ivf
  effectively does, and what the refresh path exists to avoid;
  O(corpus) — grows with every epoch while refresh stays flat).

Recall@5 at nprobe=4 is measured at the end on the maintained index so
the speedup can't be bought with accuracy. Prints one JSON line for
the BASELINE.md ledger.

    python tools/bench_ann.py [rows_per_batch] [batches] [seed_rows]

``--codebooks [corpus_rows]`` (VERDICT r11 next-4) runs the OTHER
ledger instead: on a clustered corpus whose lowest-id vectors
co-locate in one blob (the adversarial-but-realistic case — ids
arrive in ingest order, and early ingest is rarely a uniform sample),
measure recall@5 at fixed nprobe for build(codebook="lowest_id") vs
build(codebook="kmeans"), plus both build costs. The uniform
maintenance fixture above hides the codebook difference by
construction (its lowest ids already cover every blob); this fixture
does not.

    python tools/bench_ann.py --codebooks [corpus_rows]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def codebooks_main() -> None:
    import random

    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000

    from pyspark.sql import functions as F

    from yelp_data_engineering_pipeline_spark.operators.ann_index import (
        IvfIndex,
    )
    from yelp_data_engineering_pipeline_spark.operators.similarity import (
        recall_at_k, topk_bruteforce,
    )
    from yelp_data_engineering_pipeline_spark.operators.upsert import (
        ParquetMergeTable,
    )
    from yelp_data_engineering_pipeline_spark.session import get_spark

    D = 8
    N_CELLS = 8

    def vec(rng, cluster, noise=0.15):
        return [(1.0 if i == cluster else 0.0)
                + rng.uniform(-noise, noise) for i in range(D)]

    spark = get_spark("bench-ann-codebooks")
    base = tempfile.mkdtemp(prefix="ann_cb_")
    rng = random.Random(23)
    try:
        data = [(i, vec(rng, 0)) for i in range(N_CELLS)]
        data += [(i, vec(rng, (i % 4) * 2)) for i in range(N_CELLS, rows)]
        corpus = ParquetMergeTable(spark, f"{base}/c", key="vec_id")
        corpus.merge(spark.createDataFrame(
            data, "vec_id long, embedding array<double>"))
        snap = corpus.read()
        q = snap.filter(F.col("vec_id").isin(list(range(100, 164))))
        exact = topk_bruteforce(q, snap, 5).cache()
        out = {"metric": "ann_codebooks", "corpus_rows": rows,
               "n_centroids": N_CELLS}
        # kmeans_sampled (r13): Lloyd on a hash-bottom-n sample —
        # rounds scan sample_n rows instead of the corpus; the ledger
        # pins its recall against full-corpus training
        sample_n = max(1000, rows // 16)
        out["sample_n"] = sample_n
        variants = (("lowest_id", {}),
                    ("kmeans", {"codebook": "kmeans"}),
                    ("kmeans_sampled", {"codebook": "kmeans",
                                        "sample_n": sample_n}))
        for cb, kw in variants:
            ix = IvfIndex(spark, f"{base}/ix_{cb}")
            t0 = time.perf_counter()
            ix.build(corpus, n_centroids=N_CELLS, **kw)
            out[f"build_{cb}_s"] = round(time.perf_counter() - t0, 3)
            for np_ in (1, 2):
                r = (recall_at_k(exact, ix.search(q, 5, nprobe=np_), 5)
                     .agg(F.avg("recall_at_5").alias("m")).first().m)
                out[f"recall5_np{np_}_{cb}"] = round(float(r), 3)
            out[f"cells_{cb}"] = len(ix.meta()["centroids"])
        exact.unpersist()
        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    import random

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    seed_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 40_000
    # r13 (VERDICT r12 next-5): the production configuration — sq8
    # storage + trained (sampled) codebook — measured end-to-end at
    # the composite tier:  python tools/bench_ann.py 4000 10 40000000
    # sq8 kmeans 10
    store = sys.argv[4] if len(sys.argv) > 4 else "float"
    codebook = sys.argv[5] if len(sys.argv) > 5 else "lowest_id"
    rebuild_every = int(sys.argv[6]) if len(sys.argv) > 6 else 1

    from pyspark.sql import functions as F

    from yelp_data_engineering_pipeline_spark.operators.ann_index import (
        IvfIndex,
    )
    from yelp_data_engineering_pipeline_spark.operators.similarity import (
        recall_at_k, topk_bruteforce,
    )
    from yelp_data_engineering_pipeline_spark.operators.upsert import (
        ParquetMergeTable,
    )
    from yelp_data_engineering_pipeline_spark.session import get_spark

    D = 8
    schema = "vec_id long, ep long, embedding array<double>"

    def vec(rng, cluster, noise=0.2):
        return [(1.0 if i == cluster % D else 0.0)
                + rng.uniform(-noise, noise) for i in range(D)]

    spark = get_spark("bench-ann")
    base = tempfile.mkdtemp(prefix="ann_")
    rng = random.Random(42)

    def manifest_bytes(table) -> int:
        _, _, bts, _ = table._zone_arrays(
            table.current_version(), [], with_bytes=True, with_rows=False)
        return sum(b for b in bts if isinstance(b, int))

    try:
        corpus = ParquetMergeTable(spark, f"{base}/corp", key="vec_id",
                                   partition_by="ep")
        if seed_rows > 100_000:
            # distributed synthesis: same 8-blob family with
            # hash-derived noise — a 40M-tuple driver list is neither
            # feasible nor the point (the ledger measures maintenance,
            # not driver serialization)
            seed_df = spark.range(seed_rows).select(
                F.col("id").alias("vec_id"),
                F.lit(0).cast("long").alias("ep"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(D - 1)),
                    lambda j: (
                        F.when(F.pmod(F.col("id"), F.lit(D))
                               == j.cast("long"), 1.0).otherwise(0.0)
                        + (F.pmod(F.hash(F.col("id"), j), F.lit(10_000))
                           .cast("double") / 10_000.0 - 0.5) * 0.4
                    )).alias("embedding"))
        else:
            seed_df = spark.createDataFrame(
                [(i, 0, vec(rng, i % D)) for i in range(seed_rows)],
                schema)
        corpus.merge(seed_df)
        ix = IvfIndex(spark, f"{base}/ix", partition_by="ep",
                      store=store)
        bkw: dict = {"n_centroids": 8, "codebook": codebook}
        if codebook == "kmeans":
            bkw["sample_n"] = min(seed_rows, 262_144)
        t0 = time.perf_counter()
        ix.build(corpus, **bkw)
        build_s = time.perf_counter() - t0

        refresh_s: list[float] = []
        rebuild_s: list[float] = []
        # bounded driver bookkeeping: only CHURNED keys are tracked
        # (a 40M-entry live-key dict is its own scale bug); seed keys
        # are drawn by rejection-sampling the id range. New ids start
        # PAST the seed range — the pre-r13 scheme (100_000*ep)
        # collided with seed keys at ≥1M seeds, silently turning the
        # ladder's "inserts" into partition-moving updates.
        churn_ep: dict[int, int] = {}
        deleted: set[int] = set()
        for b in range(batches):
            ep = b + 1
            new_ids = [seed_rows + 100_000 * ep + j for j in range(rows)]
            recent = [i for i, e in churn_ep.items() if e >= ep - 2]
            if ep <= 2:
                # the seed epoch is still within the churn horizon:
                # bounded uniform draw of live seed keys
                pool: set[int] = set()
                target = min(seed_rows, 4 * rows)
                while len(pool) < target:
                    i = rng.randrange(seed_rows)
                    if i not in deleted and i not in churn_ep:
                        pool.add(i)
                recent += sorted(pool)
            recent.sort()

            def ep_of(i: int) -> int:
                return churn_ep.get(i, 0)

            batch = (
                [(i, ep, vec(rng, i % D), False) for i in new_ids]
                + [(i, ep_of(i), vec(rng, i % D), False)
                   for i in rng.sample(recent, min(rows // 4,
                                                   len(recent)))]
                + [(i, ep_of(i), None, True)
                   for i in rng.sample(recent, min(rows // 10,
                                                   len(recent)))]
            )
            corpus.merge(spark.createDataFrame(
                batch, schema + ", _del boolean"), delete_col="_del")
            for i in new_ids:
                churn_ep[i] = ep
            for i, _, _, d in batch:
                if d:
                    churn_ep.pop(i, None)
                    deleted.add(i)

            t0 = time.perf_counter()
            ix.refresh(corpus)
            refresh_s.append(time.perf_counter() - t0)

            if (b + 1) % rebuild_every == 0 or b == batches - 1:
                scratch = f"{base}/rb{b}"
                t0 = time.perf_counter()
                IvfIndex(spark, scratch, partition_by="ep",
                         store=store).build(corpus, **bkw)
                rebuild_s.append(time.perf_counter() - t0)
                shutil.rmtree(scratch, ignore_errors=True)
            corpus.vacuum(keep_last_n=4, stage_grace_seconds=0)

        q_ids = new_ids[:8]
        snap = corpus.read()
        q = snap.filter(F.col("vec_id").isin(q_ids))
        exact = topk_bruteforce(q, snap, 5).cache()
        rec = (recall_at_k(exact, ix.search(q, 5, nprobe=4), 5)
               .agg(F.avg("recall_at_5").alias("m")).first().m)
        # the production answer path for quantized storage: sq8 picks
        # candidates, raw-vector re-rank restores exact scores
        rec_rr = (recall_at_k(
            exact, ix.search(q, 5, nprobe=4, rerank=corpus), 5)
            .agg(F.avg("recall_at_5").alias("m")).first().m)
        exact.unpersist()
        m = ix.meta()
        corpus_b = manifest_bytes(corpus)
        assign_b = manifest_bytes(ix.assign)
        k_last = min(5, len(rebuild_s))
        print(json.dumps({
            "metric": "ann_maintenance",
            "seed_rows": seed_rows,
            "rows_per_batch": rows,
            "batches": batches,
            "store": store,
            "codebook": codebook,
            "sample_n": bkw.get("sample_n"),
            "corpus_rows": snap.count(),
            "build_s": round(build_s, 3),
            "refresh_avg_s": round(sum(refresh_s) / len(refresh_s), 3),
            "refresh_last5_s": round(sum(refresh_s[-5:]) / 5, 3),
            "rebuilds_measured": len(rebuild_s),
            "rebuild_avg_s": round(sum(rebuild_s) / len(rebuild_s), 3),
            "rebuild_lastk_s": round(sum(rebuild_s[-k_last:]) / k_last, 3),
            "speedup_lastk": round(
                (sum(rebuild_s[-k_last:]) / k_last)
                / (sum(refresh_s[-5:]) / 5), 2),
            "recall_at_5_nprobe4": round(float(rec), 3),
            "recall_at_5_nprobe4_rerank": round(float(rec_rr), 3),
            "corpus_bytes": corpus_b,
            "assign_bytes": assign_b,
            "assign_to_corpus_bytes": round(assign_b / corpus_b, 3),
            "full_builds": m["full_builds"],
            "full_reassigns": m.get("full_reassigns", 0),
        }))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--codebooks":
        codebooks_main()
    else:
        main()
