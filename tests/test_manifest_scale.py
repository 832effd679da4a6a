"""Manifest-plane scale bounds (VERDICT r8 next-2): the metadata
plane gets the same ×10 ladder discipline as the data plane. Large
full manifests externalize their file listing to a parquet checkpoint
sidecar (``<n>.ckpt.<token>.parquet``); readers resolve KEYS ONLY for
plain scans. Chains here are SYNTHESIZED — manifests are just records,
no data files needed — so a 20k-file table costs milliseconds to
build and the budgets run in CI."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from yelp_data_engineering_pipeline_spark.operators.upsert import (
    ParquetMergeTable,
)

_SCHEMA = StructType([StructField("id", LongType()),
                      StructField("v", LongType())]).jsonValue()


def _entry(i: int) -> dict:
    return {
        "rows": 125_000,
        "cols": {
            "id": {"min": i * 125_000, "max": (i + 1) * 125_000 - 1,
                   "nulls": 0},
            "v": {"min": 857.71 + i, "max": 555_285.16 + i, "nulls": 0},
        },
    }


def _key(i: int) -> str:
    return (f"_data/tx-{i // 500:08x}feed/"
            f"part-{i:06d}-0000-c000.snappy.parquet")


def _publish_full(t: ParquetMergeTable, v: int, files: dict) -> None:
    man = {"format": 2, "version": v, "operation": "merge",
           "committed_at_unix": 0.0, "base": "root", "schema": _SCHEMA,
           "dv": {}, "n_files": len(files), "chain": 0, "files": files}
    t._publish(v, t._externalize_files(v, man))


def _publish_delta(t: ParquetMergeTable, v: int, parent: int,
                   added: dict, removed: list) -> None:
    chain = t._manifest(parent).get("chain", 0) + 1
    man = {"format": 2, "version": v, "operation": "merge",
           "committed_at_unix": 0.0, "base": "root", "schema": _SCHEMA,
           "dv": {}, "n_files": 0, "chain": chain, "delta_of": parent,
           "added": added, "removed": removed}
    t._publish(v, man)


def _fresh(spark, root) -> ParquetMergeTable:
    """A cold handle: empty _mcache/_fcache, nothing resolved."""
    return ParquetMergeTable(spark, str(root), key="id", storage="object")


def test_checkpoint_externalizes_and_resolves_exactly(spark, tmp_path):
    """Above _CKPT_INLINE_MAX the full record moves its listing to the
    parquet sidecar; resolution (full AND keys-only) equals the
    inline-form ground truth through a delta chain."""
    t = _fresh(spark, tmp_path / "tbl")
    n = ParquetMergeTable._CKPT_INLINE_MAX + 500
    files = {_key(i): _entry(i) for i in range(n)}
    _publish_full(t, 1, files)

    man = t._manifest(1)
    assert "files" not in man and "ckpt" in man
    assert t._backend.exists(t._ckpt_path(man["ckpt"]))

    truth = dict(files)
    # two deltas: churn 100, add 50
    for v in (2, 3):
        removed = sorted(truth)[:100]
        added = {f"new-v{v}-{j}.parquet": _entry(j) for j in range(50)}
        for r in removed:
            truth.pop(r)
        truth.update(added)
        _publish_delta(t, v, v - 1, added, removed)

    cold = _fresh(spark, tmp_path / "tbl")
    assert cold._files(3) == truth
    cold2 = _fresh(spark, tmp_path / "tbl")
    assert cold2._file_keys(3) == sorted(truth)
    assert cold._files(1) == files


def test_vacuum_materializes_floor_and_sweeps_sidecars(spark, tmp_path):
    """vacuum on a checkpointed chain: the retention floor's delta
    materializes to a full record (externalized again), retired
    versions' sidecars are deleted, the live head's sidecar survives,
    and a lost-race orphan sidecar is swept past the grace window."""
    t = _fresh(spark, tmp_path / "tbl")
    n = ParquetMergeTable._CKPT_INLINE_MAX + 100
    files = {_key(i): _entry(i) for i in range(n)}
    _publish_full(t, 1, files)
    truth = dict(files)
    for v in (2, 3, 4):
        added = {f"new-v{v}.parquet": _entry(v)}
        truth.update(added)
        _publish_delta(t, v, v - 1, added, [])
    v1_sidecar = t._ckpt_path(t._manifest(1)["ckpt"])
    # a racing loser's sidecar: version 9 never committed its json
    orphan = t._ckpt_path("9.ckpt.deadbeef00.parquet")
    t._backend.put(orphan, b"PAR1junk")

    removed = t.vacuum(keep_last_n=2, stage_grace_seconds=0)
    assert removed == [1, 2]
    assert not os.path.exists(v1_sidecar)          # retired with v1
    assert not os.path.exists(orphan)              # orphan swept
    # floor (v3) materialized full + externalized, content identical
    fman = t._manifest(3)
    assert "ckpt" in fman and "delta_of" not in fman
    want3 = dict(files)
    want3.update({"new-v2.parquet": _entry(2), "new-v3.parquet": _entry(3)})
    cold = _fresh(spark, tmp_path / "tbl")
    assert cold._files(3) == want3
    assert cold._files(4) == truth
    assert os.path.exists(t._ckpt_path(fman["ckpt"]))


def test_manifest_plane_budgets_at_20k_files(spark, tmp_path):
    """The CI bound mirroring the BASELINE.md manifest ladder:
    at 20k files the checkpoint write stays under 60 B/file and a
    COLD keys-only resolve under 25 µs/file (0.5 s) — the quantities
    that, held per-file, keep a 100 TB table's (~800k files) cold
    read around a second and its checkpoint in the tens of MB."""
    t = _fresh(spark, tmp_path / "tbl")
    n = 20_000
    files = {_key(i): _entry(i) for i in range(n)}
    t0 = time.time()
    _publish_full(t, 1, files)
    write_s = time.time() - t0
    man = t._manifest(1)
    size = os.path.getsize(t._ckpt_path(man["ckpt"]))
    json_size = os.path.getsize(t._manifest_path(1))
    assert size / n <= 60, f"{size / n:.1f} B/file checkpoint"
    assert json_size < 64 * 1024          # the json stays O(1)
    assert write_s < 5.0

    for v in (2, 3):
        _publish_delta(t, v, v - 1,
                       {f"new-{v}.parquet": _entry(v)}, [])
        dsize = os.path.getsize(t._manifest_path(v))
        assert dsize < 64 * 1024          # delta is O(changed files)

    cold = _fresh(spark, tmp_path / "tbl")
    t0 = time.time()
    keys = cold._file_keys(3)
    keys_s = time.time() - t0
    assert len(keys) == n + 2
    assert keys_s / n <= 25e-6, f"keys-only {keys_s:.3f}s at {n} files"

    cold2 = _fresh(spark, tmp_path / "tbl")
    t0 = time.time()
    full = cold2._files(3)
    full_s = time.time() - t0
    assert len(full) == n + 2
    assert full_s / n <= 100e-6, f"full resolve {full_s:.3f}s at {n} files"


def test_real_table_through_externalized_checkpoints(spark, tmp_path):
    """Integration: with the inline threshold forced low, a REAL
    Spark-backed table runs its whole lifecycle — merge, pruned merge,
    DV delete, time travel, restore, vacuum, clone — with every full
    record externalized; results identical to the inline path."""
    orig = ParquetMergeTable._CKPT_INLINE_MAX
    ParquetMergeTable._CKPT_INLINE_MAX = 3
    try:
        t = ParquetMergeTable(spark, str(tmp_path / "tbl"), key="id",
                              partition_by="p", storage="object")
        t.merge(spark.createDataFrame(
            [(i, chr(97 + i % 4), i) for i in range(40)],
            "id long, p string, v long"))
        assert "ckpt" in t._manifest(1)           # externalized
        t.merge(spark.createDataFrame([(1, "b", -1)],
                                      "id long, p string, v long"))
        t.delete_where({"id": (8, 11)}, use_deletion_vectors=True)
        got = {r.id: r.v for r in t.read().collect()}
        want = {i: i for i in range(40) if i not in (8, 9, 10, 11)}
        want[1] = -1
        assert got == want
        assert t.read(version=1).count() == 40    # time travel
        v = t.restore(1)
        assert t.read().count() == 40
        t.vacuum(keep_last_n=2, stage_grace_seconds=0)
        with pytest.raises(ValueError, match="vacuumed"):
            t.read(version=1)
        assert {r.id: r.v for r in t.read(version=v).collect()} == \
            {i: i for i in range(40)}
        c = t.clone(str(tmp_path / "cl"))
        assert c.read().count() == 40
        # count_where still answers from the (externalized) zone maps
        assert t.count_where({"id": (0, 9)}) == 10
    finally:
        ParquetMergeTable._CKPT_INLINE_MAX = orig
