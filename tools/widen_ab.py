"""A/B the NEW estimated-width widen decision vs the OLD eager
.rdd.getNumPartitions() one, on the real call-site frame shapes at
every test SF tier. Decisions only steer performance (repartition vs
no-op) — this checks the estimator doesn't flip them."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from yelp_data_engineering_pipeline_spark.partitioning import (  # noqa: E402
    _COMPUTE_BYTES_PER_SPLIT,
    _local_input_bytes,
    estimated_width,
)
from yelp_data_engineering_pipeline_spark.session import get_spark  # noqa: E402
from yelp_data_engineering_pipeline_spark.tables import load  # noqa: E402


def main() -> None:
    spark = get_spark("widen-ab")
    par = spark.sparkContext.defaultParallelism
    disagree = 0
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        from yelp_data_engineering_pipeline_spark.operators import dedup

        docs = load(spark, sf_dir, "documents")
        emb = load(spark, sf_dir, "embeddings")
        # derived frame like cascade tier-2 input: post-dedup projection
        s2 = dedup.dedup_exact(spark, sf_dir)
        frames = {
            "documents_scan": docs,
            "embeddings_scan": emb,
            "docs_projected": docs.select("doc_id", "text"),
            "cascade_s2_derived": s2,
        }
        for name, df in frames.items():
            sizes = _local_input_bytes(df)
            target = par
            if sizes:
                target = min(target, max(1, sum(sizes) // _COMPUTE_BYTES_PER_SPLIT))
            old_cur = df.rdd.getNumPartitions()
            new_cur = estimated_width(df, sizes)
            old_widen = old_cur < target
            if new_cur is None:
                new_widen = bool(sizes and sum(sizes) <= (64 << 20))
            else:
                new_widen = new_cur < target
            flag = "" if old_widen == new_widen else "  <<< DISAGREE"
            if old_widen != new_widen:
                disagree += 1
            print(
                f"{sf:8s} {name:22s} target={target:3d} old_cur={old_cur:3d} "
                f"new_cur={new_cur} old_widen={old_widen} new_widen={new_widen}{flag}"
            )
    print(f"\ndisagreements: {disagree}")


if __name__ == "__main__":
    main()
