"""Clustering-decay maintenance (VERDICT r10 next-7): a whole-table
``compact(zorder_by=...)`` declares the table's clustering intent in
the manifest; DML churn then decays the LAYOUT silently (every
partition rewrite emits a file spanning that partition's full key
range) while the intent survives. ``clustering_overlap`` measures the
decay from metadata alone — exact average pairwise zone-range overlap
— ``maintenance_plan`` recommends ``rezorder()`` past the floor, and
``rezorder()`` restores the declared layout.

Reference parity note: the reference app has no clustered storage at
all (it delegates every read to PostgreSQL —
reference/parse_and_upload_to_db.py); this leg exists so the zone-map
skipping economics measured in BASELINE.md survive a year of writes.
"""

from __future__ import annotations

import random

import pytest

from yelp_data_engineering_pipeline_spark.operators.upsert import (
    ParquetMergeTable,
)


def test_clustering_overlap_matches_hand_computed(spark, tmp_path):
    # four files with HAND-KNOWN id ranges (one per partition):
    # (0,10) and (5,15) overlap; (20,30) and (25,35) overlap — 4
    # directed overlapping pairs out of 4*3 → exactly 1/3
    t = ParquetMergeTable(spark, str(tmp_path / "t"), key="id",
                          partition_by="p")
    ranges = {0: (0, 10), 1: (5, 15), 2: (20, 30), 3: (25, 35)}
    rows = [(b, p) for p, bounds in ranges.items() for b in bounds]
    t.merge(spark.createDataFrame(rows, "id long, p int")
            .repartition("p"))
    assert len(t._file_keys(t.current_version())) == 4
    ov = t.clustering_overlap(["id"])["id"]
    assert ov == {"files": 4, "bounded": 4,
                  "avg_overlap": round(4 / 12, 4)}

    # disjoint ground truth: overlap is exactly 0
    t2 = ParquetMergeTable(spark, str(tmp_path / "t2"), key="id",
                           partition_by="p")
    rows2 = [(b, p) for p, bounds in
             {0: (0, 10), 1: (20, 30), 2: (40, 50)}.items()
             for b in bounds]
    t2.merge(spark.createDataFrame(rows2, "id long, p int")
             .repartition("p"))
    ov2 = t2.clustering_overlap(["id"])["id"]
    assert ov2 == {"files": 3, "bounded": 3, "avg_overlap": 0.0}

    # a column with NO zone stats can never be pruned → counts as
    # overlapping everything (the conservative skipping semantics)
    missing = t2.clustering_overlap(["no_such_col"])["no_such_col"]
    assert missing["bounded"] == 0
    assert missing["avg_overlap"] == 1.0


def test_intent_recorded_and_carried_through_dml(spark, tmp_path):
    t = ParquetMergeTable(spark, str(tmp_path / "t"), key="id")
    t.merge(spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id long, v double"))
    assert t.clustered_by() == []
    assert t.maintenance_plan()["clustering"] == {}

    t.compact(zorder_by=("id",), target_files=4)
    assert t.clustered_by() == ["id"]

    # intent survives ordinary DML commits (carried like schema)
    t.merge(spark.createDataFrame([(5, -1.0)], "id long, v double"))
    t.delete_keys("id", [7])
    assert t.clustered_by() == ["id"]

    # undeclared table: rezorder refuses rather than guessing keys
    t3 = ParquetMergeTable(spark, str(tmp_path / "t3"), key="id")
    t3.merge(spark.createDataFrame([(1, 1.0)], "id long, v double"))
    with pytest.raises(ValueError, match="clustering"):
        t3.rezorder()


def test_decay_fires_recommendation_and_rezorder_clears(spark, tmp_path):
    # partition p = id % 8: every partition spans the full id domain,
    # so a partition REWRITE (what merge does) emits wide files — the
    # real-world decay shape
    t = ParquetMergeTable(spark, str(tmp_path / "t"), key="id",
                          partition_by="p")
    t.merge(spark.createDataFrame(
        [(i, i % 8, 0.0) for i in range(2000)],
        "id long, p int, v double"))
    t.compact(zorder_by=("id",), target_files=8)
    plan = t.maintenance_plan()
    assert plan["clustering"]["id"]["avg_overlap"] < 0.5, plan
    assert "rezorder()" not in plan["actions"]

    # churn: merges rewrite partitions wholesale (files spanning the
    # whole id domain), then a plain small-file compaction — exactly
    # the soak's maintenance mix — coalesces WITHOUT the z-sort,
    # wiping the layout while the declared intent carries forward
    base = plan["clustering"]["id"]["avg_overlap"]
    rng = random.Random(7)
    for p in range(8):
        ids = rng.sample(range(p, 2000, 8), 50)
        t.merge(spark.createDataFrame(
            [(i, p, -1.0) for i in ids], "id long, p int, v double"))
    mid = t.clustering_overlap(["id"])["id"]["avg_overlap"]
    assert mid > base, (mid, base)       # churn decays monotonically
    t.compact(target_files=4)
    plan = t.maintenance_plan()
    assert t.clustered_by() == ["id"]
    assert plan["clustering"]["id"]["avg_overlap"] >= 0.5, plan
    assert "rezorder()" in plan["actions"], plan

    before = sorted((r.id, r.v) for r in t.read().collect())
    t.rezorder(target_files=8)
    plan = t.maintenance_plan()
    assert plan["clustering"]["id"]["avg_overlap"] < 0.5, plan
    assert not any(a.startswith("rezorder") for a in plan["actions"]), plan
    # byte-identical rows: rezorder is a re-layout, never a rewrite
    # of content
    assert sorted((r.id, r.v) for r in t.read().collect()) == before


def test_incremental_rezorder_rewrites_only_decayed_files(spark, tmp_path):
    """The 100 TB form: after churn widens ONE partition's files,
    rezorder(only_decayed=True) must rewrite just those, carry every
    still-narrow file untouched, clear the decay, and no-op when
    nothing is decayed."""
    t = ParquetMergeTable(spark, str(tmp_path / "t"), key="id",
                          partition_by="p")
    t.merge(spark.createDataFrame(
        [(i, i % 8, 0.0) for i in range(2000)],
        "id long, p int, v double"))
    t.compact(zorder_by=("id",), target_files=8)

    # freshly clustered: nothing decayed → metadata no-op
    v0 = t.current_version()
    assert t.rezorder(only_decayed=True) == v0
    assert t.current_version() == v0

    # churn one partition: its rewrite emits files spanning the whole
    # id domain while the other 7 partitions stay narrow
    rng = random.Random(3)
    ids = rng.sample(range(3, 2000, 8), 120)
    t.merge(spark.createDataFrame(
        [(i, 3, -1.0) for i in ids], "id long, p int, v double"))
    before_files = set(t._file_keys(t.current_version()))
    before_rows = sorted((r.id, r.v) for r in t.read().collect())
    prof, _ = t._overlap_profile(t.current_version(), "id")
    n_wide = sum(1 for f in prof.values() if f >= 0.5)
    assert 0 < n_wide < len(prof), prof   # decayed, but not everything

    t.rezorder(only_decayed=True, target_files=4)
    after_files = set(t._file_keys(t.current_version()))
    carried = before_files & after_files
    # every non-victim carried untouched; victims gone
    assert len(carried) == len(before_files) - n_wide, (
        len(carried), len(before_files), n_wide)
    assert t.clustering_overlap(["id"])["id"]["avg_overlap"] < 0.5
    assert sorted((r.id, r.v) for r in t.read().collect()) == before_rows
    assert t._manifest(t.current_version())["operation"] == "rezorder"


def test_clustering_declaration_survives_restore_and_clone(spark, tmp_path):
    """restore() and clone() hand-build their manifests; the
    clustering declaration must ride along (found by the rezorder
    ledger tool: rezorder() after restore raised 'needs a recorded
    clustering'). Restoring to a PRE-clustering version genuinely
    un-declares it."""
    t = ParquetMergeTable(spark, str(tmp_path / "t"), key="id")
    t.merge(spark.createDataFrame(
        [(i, float(i)) for i in range(200)], "id long, v double"))  # v1
    t.compact(zorder_by=("id",), target_files=4)                    # v2
    t.merge(spark.createDataFrame([(5, -1.0)], "id long, v double"))  # v3

    t.restore(2)                                                    # v4
    assert t.clustered_by() == ["id"]
    t.rezorder(target_files=4)      # must not raise

    c = t.clone(str(tmp_path / "c"))
    assert c.clustered_by() == ["id"]

    t.restore(1)                    # pre-clustering snapshot
    assert t.clustered_by() == []
    assert t.maintenance_plan()["clustering"] == {}


def test_declare_clustering_metadata_only_commit(spark, tmp_path):
    """declare_clustering (r12, the failover layout-carry primitive):
    sets the intent WITHOUT rewriting a byte — same manifest field a
    whole-table zorder records, carried by later commits, validated
    against the schema, idempotent — and makes rezorder()/the decay
    leg available on a table that never ran compact(zorder_by=...)."""
    t = ParquetMergeTable(spark, str(tmp_path / "t"), key="id",
                          partition_by="p")
    # three full-range commits: every file spans the id domain, so the
    # declared intent is measurably decayed from day one
    for b in range(3):
        t.merge(spark.createDataFrame(
            [(i, i % 2, i) for i in range(b, 2700, 3)],
            "id long, p int, v long"))
    with pytest.raises(ValueError):
        t.declare_clustering([])
    with pytest.raises(ValueError):
        t.declare_clustering(["no_such_col"])
    assert t.clustered_by() == []
    with pytest.raises(ValueError):
        t.rezorder()                      # nothing declared yet
    v0 = t.current_version()
    files0 = t._file_keys(v0)
    v1 = t.declare_clustering(["id"])
    assert v1 == v0 + 1
    assert t.clustered_by() == ["id"]
    assert t._file_keys(v1) == files0     # metadata-only: no rewrite
    assert t.declare_clustering(["id"]) == v1   # idempotent
    # carried forward by later commits, like any declared intent
    t.merge(spark.createDataFrame([(5000, 0, 1)], "id long, p int, v long"))
    assert t.clustered_by() == ["id"]
    # a plain coalescing compact (no z-sort) decays the layout against
    # the declared intent; the decay leg watches it and recommends the
    # re-layout (the verify-skill-documented way to force decay —
    # small CoW merges preserve narrow splits and never decay)
    t.compact(target_files=2)
    plan = t.maintenance_plan()
    assert set(plan["clustering"]) == {"id"}
    assert any(a.startswith("rezorder") for a in plan["actions"]), plan
    # ...which is now runnable and clears the recommendation
    t.rezorder(target_files=4)
    plan2 = t.maintenance_plan()
    assert not any(a.startswith("rezorder") for a in plan2["actions"])
