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


@pytest.mark.slow  # machine-speed budget probe (r14: see pytest.ini)
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

    # min-of-3 fresh-handle attempts (still cold per attempt — caches
    # are per-handle): de-noises suite-load GC pauses, same rationale
    # as the 100k skipping-budget test below.
    keys_s = full_s = float("inf")
    for _ in range(3):
        cold = _fresh(spark, tmp_path / "tbl")
        t0 = time.time()
        keys = cold._file_keys(3)
        keys_s = min(keys_s, time.time() - t0)
        assert len(keys) == n + 2
    assert keys_s / n <= 25e-6, f"keys-only {keys_s:.3f}s at {n} files"

    for _ in range(3):
        cold2 = _fresh(spark, tmp_path / "tbl")
        t0 = time.time()
        full = cold2._files(3)
        full_s = min(full_s, time.time() - t0)
        assert len(full) == n + 2
    assert full_s / n <= 100e-6, f"full resolve {full_s:.3f}s at {n} files"


def test_real_table_through_externalized_checkpoints(spark, tmp_path):
    """Integration: with BOTH inline thresholds forced low, a REAL
    Spark-backed table runs its whole lifecycle — merge, pruned merge,
    DV delete, time travel, restore, vacuum, clone — with every full
    record externalized to a parquet checkpoint AND every deletion
    vector externalized to a binary sidecar; results identical to the
    inline path."""
    orig = ParquetMergeTable._CKPT_INLINE_MAX
    orig_dv = ParquetMergeTable._DV_INLINE_TOTAL_MAX
    ParquetMergeTable._CKPT_INLINE_MAX = 3
    ParquetMergeTable._DV_INLINE_TOTAL_MAX = 0
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
        dv_entries = list(t._manifest(3)["dv"].values())
        assert dv_entries and all(isinstance(e, dict) and "ref" in e
                                  for e in dv_entries)
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
        ParquetMergeTable._DV_INLINE_TOTAL_MAX = orig_dv


def test_dv_sidecar_externalization_and_zero_rewrite_carry(spark, tmp_path):
    """Deletion vectors above the inline threshold externalize to a
    binary sidecar and CARRY BY REFERENCE: a later commit's record
    holds ~60-byte {ref, off, n} pointers — the O(deleted rows)-per-
    commit JSON growth is gone — while reads, metadata counts, time
    travel, compaction purge and vacuum reference-counting all hold."""
    import json as _json

    t = ParquetMergeTable(spark, str(tmp_path / "tbl"), key="id",
                          partition_by="p", storage="object")
    rows = spark.range(0, 10_000).selectExpr(
        "id", "case when id < 8000 then 'a' else 'b' end as p",
        "id * 2 as v",
    ).repartitionByRange(4, "id").sortWithinPartitions("id")
    t.merge(rows)
    v_dv = t.delete_where({"id": (1000, 3999)},
                          use_deletion_vectors=True)  # 3000 positions

    man = t._manifest(v_dv)
    entries = list((man.get("dv") or {}).values())
    assert entries and all(isinstance(e, dict) and "ref" in e
                           for e in entries)
    sidecars = {e["ref"] for e in entries}
    assert len(sidecars) == 1
    sc = next(iter(sidecars))
    assert os.path.getsize(t._dv_sidecar_path(sc)) == 3000 * 8
    # the record itself stays small though 3000 positions are in force
    assert os.path.getsize(t._manifest_path(v_dv)) < 16 * 1024

    # reads + metadata counts resolve through the sidecar
    assert t.read().count() == 7000
    assert t.count_where({"id": (0, 4999)}) == 2000
    d = t.dv_density()
    assert d["dv_positions"] == 3000
    assert sum(len(p) for p in t.deletion_vectors().values()) == 3000

    # a commit touching ONLY p=b carries the p=a DVs by reference:
    # identical ref entries, no new sidecar, tiny record
    v_carry = t.merge(spark.createDataFrame(
        [(9999, "b", -1)], "id long, p string, v long"))
    man2 = t._manifest(v_carry)
    assert {e["ref"] for e in man2["dv"].values()} == {sc}
    assert man2["dv"] == man["dv"]
    assert len(_json.dumps(man2["dv"])) < 6000   # pointers, not rows
    assert t.read().count() == 7000
    assert t.read(version=v_dv).count() == 7000  # time travel

    # compact purges the DVs; the sidecar dies once no retained
    # manifest references it
    t.compact()
    assert t.deletion_vectors() == {}
    t.vacuum(keep_last_n=1, stage_grace_seconds=0)
    assert not os.path.exists(t._dv_sidecar_path(sc))
    assert t.read().count() == 7000


def test_dv_sidecar_survives_while_referenced_and_clone_rekeys(
        spark, tmp_path):
    """vacuum keeps a DV sidecar as long as ANY retained manifest
    references it (refs outlive their writing version); clone
    materializes positions and re-externalizes under ITS OWN sidecars,
    so a source vacuum can't break the clone (deep-clone contract);
    restore revives the DV state through the refs."""
    t = ParquetMergeTable(spark, str(tmp_path / "tbl"), key="id",
                          partition_by="p", storage="object")
    t.merge(spark.range(0, 10_000).selectExpr(
        "id", "case when id < 8000 then 'a' else 'b' end as p",
        "id * 2 as v").repartitionByRange(4, "id")
        .sortWithinPartitions("id"))
    # spans two file BOUNDARIES (no fully-contained file, which would
    # drop metadata-only): 3000 DV'd positions, above the threshold
    v_dv = t.delete_where({"id": (1000, 3999)}, use_deletion_vectors=True)
    sc = next(iter({e["ref"] for e in t._manifest(v_dv)["dv"].values()}))
    # two carrying commits, then vacuum retaining only the latest two:
    # the sidecar (written at v_dv, now below the floor) must survive
    # because the retained heads still reference it
    t.merge(spark.createDataFrame([(9999, "b", -1)],
                                  "id long, p string, v long"))
    t.merge(spark.createDataFrame([(9998, "b", -2)],
                                  "id long, p string, v long"))
    t.vacuum(keep_last_n=2, stage_grace_seconds=0)
    assert os.path.exists(t._dv_sidecar_path(sc))
    assert t.read().count() == 7000

    c = t.clone(str(tmp_path / "cl"))
    crefs = {e["ref"] for e in c._manifest(1)["dv"].values()
             if isinstance(e, dict)}
    assert crefs and all(r.startswith("1.dv.") for r in crefs)
    assert c.read().count() == 7000
    # source vacuum to one version (purging nothing the clone needs)
    t.compact()
    t.vacuum(keep_last_n=1, stage_grace_seconds=0)
    assert not os.path.exists(t._dv_sidecar_path(sc))
    assert c.read().count() == 7000              # clone independent

    # restore on the clone: back to its own v1 (with DVs) after a
    # full rewrite purged them
    c.compact()
    assert c.deletion_vectors() == {}
    c.restore(1)
    assert sum(len(p) for p in c.deletion_vectors().values()) == 3000
    assert c.read().count() == 7000


@pytest.mark.slow  # machine-speed budget probe (r14: see pytest.ini)
def test_cold_skipping_resolve_budget_100k_files(spark, tmp_path):
    """VERDICT r9 next-1 CI budget: the SKIPPING resolve (predicate →
    surviving file list), not just keys-only, must stay ≤2 µs/file
    cold at 100k files — the per-file quantity that keeps a 100 TB
    table's (~800k files) predicate planning around a second. The
    lazy path reads ONLY the probed column's arrays out of the
    columnar checkpoint; correctness of the surviving set is asserted
    against the synthetic zone layout."""
    t = _fresh(spark, tmp_path / "tbl")
    n = 100_000
    files = {_key(i): _entry(i) for i in range(n)}
    _publish_full(t, 1, files)
    assert "ckpt" in t._manifest(1)

    # min-of-3 fresh-handle attempts: each attempt is still COLD (the
    # resolver caches are per-handle; every iteration re-reads the
    # checkpoint parquet), the min de-noises suite-load GC pauses that
    # once pushed a 0.14 s resolve past the budget under full-battery
    # contention while the isolated run sat comfortably inside it.
    lo, hi = 50 * 125_000, 60 * 125_000 - 1      # files 50..59 by zone
    skip_s = float("inf")
    for _ in range(3):
        cold = _fresh(spark, tmp_path / "tbl")
        t0 = time.time()
        keys, rows, _, za = cold._zone_arrays(1, ["id"])
        keep, cont = cold._mask_range(za, len(keys), {"id": (lo, hi)}, True)
        kept = cold._keys_where(keys, keep)
        skip_s = min(skip_s, time.time() - t0)
        assert kept == sorted(_key(i) for i in range(50, 60))
        assert all(cont[i] for i, k in enumerate(keys) if keep[i])
    assert skip_s / n <= 2e-6, f"skipping resolve {skip_s:.3f}s at {n}"

    # the point-probe twin shares the budget class
    point_s = float("inf")
    for _ in range(3):
        cold2 = _fresh(spark, tmp_path / "tbl")
        t0 = time.time()
        kept_pt = cold2._point_prune("id", [50 * 125_000 + 7], 1)
        point_s = min(point_s, time.time() - t0)
        assert kept_pt == [_key(50)]
    assert point_s / n <= 2e-6, f"point resolve {point_s:.3f}s at {n}"


def test_delta_commit_never_materializes_parent_zone_maps(spark, tmp_path):
    """VERDICT r9 next-1: a NON-checkpoint commit assembles its delta
    record from parent KEYS only — _files() (the full zone-map
    materialization) must not run; the every-Nth checkpoint commit is
    the only full materialization point."""
    from pyspark.sql.types import StructType

    t = _fresh(spark, tmp_path / "tbl")
    n = ParquetMergeTable._CKPT_INLINE_MAX + 100
    files = {_key(i): _entry(i) for i in range(n)}
    _publish_full(t, 1, files)

    calls = {"files": 0}
    orig_files = t._files

    def counting(v):
        calls["files"] += 1
        return orig_files(v)

    t._files = counting
    schema = StructType.fromJson(_SCHEMA)
    # a metadata-only carrying commit (drop 3 files): delta record
    keep = sorted(files)[3:]
    v2 = t._commit_carrying(None, keep, 1, schema, "delete_where")
    assert v2 == 2
    assert calls["files"] == 0, "delta commit materialized zone maps"
    man2 = t._manifest(2)
    assert "delta_of" in man2 and man2["removed"] == sorted(files)[:3]

    # force the chain ceiling: the NEXT commit checkpoints — and since
    # r11 even THAT one never materializes per-file dicts: the sidecar
    # is built by columnar carry from the parent checkpoint (VERDICT
    # r10 next-1), so _files() stays uncalled on the whole write path
    orig_every = ParquetMergeTable._CHECKPOINT_EVERY
    ParquetMergeTable._CHECKPOINT_EVERY = 2
    try:
        v3 = t._commit_carrying(None, keep[1:], 2, schema, "delete_where")
    finally:
        ParquetMergeTable._CHECKPOINT_EVERY = orig_every
    assert v3 == 3
    assert calls["files"] == 0, "checkpoint build materialized zone maps"
    man3 = t._manifest(3)
    assert "delta_of" not in man3 and "ckpt" in man3
    cold = _fresh(spark, tmp_path / "tbl")
    assert cold._file_keys(3) == keep[1:]
    # and the carried checkpoint resolves bit-identically to the
    # dict-built equivalent
    cold2 = _fresh(spark, tmp_path / "tbl")
    assert cold2._files(3) == {k: files[k] for k in keep[1:]}


def test_checkpoint_carry_equals_dict_build(spark, tmp_path):
    """VERDICT r10 next-1: the columnar checkpoint CARRY (filter the
    parent sidecar + encode only the O(changed) overrides) resolves
    bit-identically to the dict-built checkpoint — through churn that
    removes files, re-adds a removed key with a DIFFERENT entry,
    introduces a NEW zone column (schema evolution → null-promoted),
    and carries non-canonical xjson entries verbatim."""
    from pyspark.sql.types import StructType

    t = _fresh(spark, tmp_path / "tbl")
    n = ParquetMergeTable._CKPT_INLINE_MAX + 200
    files = {_key(i): _entry(i) for i in range(n)}
    files["weird.parquet"] = {"rows": 7, "cols": {}, "custom": [1]}
    _publish_full(t, 1, files)

    # churn: remove 10; re-add one removed key with a different entry
    # and a NEW zone column "q" absent from the v1 sidecar
    readd = {_key(3): {"rows": 1,
                       "cols": {"id": {"min": 0, "max": 0, "nulls": 0},
                                "q": {"min": "a", "max": "m",
                                      "nulls": 2}}}}
    _publish_delta(t, 2, 1, readd, [_key(i) for i in range(10)])
    expected = {k: v for k, v in files.items()
                if k not in {_key(i) for i in range(10)}}
    expected.update(readd)

    schema = StructType.fromJson(_SCHEMA)
    new_files = {"fresh.parquet": {"rows": 5,
                 "cols": {"q": {"all_null": True}}}}
    keep = sorted(expected)
    orig = ParquetMergeTable._CHECKPOINT_EVERY
    ParquetMergeTable._CHECKPOINT_EVERY = 2
    try:
        # _assemble_manifest checkpoint branch with explicit entries
        man = t._externalize_files(3, t._assemble_manifest(
            3, "merge", schema, 2, keep, new_files))
        t._publish(3, man)
    finally:
        ParquetMergeTable._CHECKPOINT_EVERY = orig
    expected.update(new_files)
    assert "ckpt" in t._manifest(3)

    cold = _fresh(spark, tmp_path / "tbl")
    assert cold._files(3) == expected
    # the new column is a first-class zone column for skipping
    cold2 = _fresh(spark, tmp_path / "tbl")
    keys, _, _, za = cold2._zone_arrays(3, ["q"], with_rows=False)
    assert "q" in za
    i = _seq_index(cold2, keys, _key(3))
    assert za["q"][0][i] == "a" and za["q"][1][i] == "m"


def _seq_index(t, keys, k):
    return t._seq_list(keys).index(k)


def test_checkpoint_carry_spark_tier(spark, tmp_path):
    """Above _CKPT_SPARK_MIN resolved files the carry runs as a Spark
    job over the parent sidecar (driver holds only the O(changed)
    override set + compressed sidecar bytes); lowered threshold here
    to exercise the tier — resolve must be identical and _files()
    must never run."""
    from pyspark.sql.types import StructType

    t = _fresh(spark, tmp_path / "tbl")
    n = ParquetMergeTable._CKPT_INLINE_MAX + 300
    files = {_key(i): _entry(i) for i in range(n)}
    _publish_full(t, 1, files)
    calls = {"files": 0}
    orig_files = t._files
    t._files = lambda v: (calls.__setitem__("files", calls["files"] + 1)
                          or orig_files(v))
    keep = sorted(files)[:-7]
    schema = StructType.fromJson(_SCHEMA)
    # the override set mixes canonical and NON-canonical entries: the
    # xjson rows ride pyarrow's nullable ints through the job — a
    # pandas hop here floatifies rows/bytes (NaN ≠ null) and breaks
    # the verbatim round-trip (regression: r11 pandas-free override)
    added = {
        "jobnew.parquet": _entry(0),
        "jobbare.parquet": {"id": {"min": 5, "max": 9}},
        "jobnorows.parquet": {"cols": {"id": {"min": 1, "max": 2}}},
    }
    orig_every = ParquetMergeTable._CHECKPOINT_EVERY
    ParquetMergeTable._CHECKPOINT_EVERY = 1
    ParquetMergeTable._CKPT_SPARK_MIN = 100
    try:
        man = t._externalize_files(2, t._assemble_manifest(
            2, "merge", schema, 1, keep, added))
        t._publish(2, man)
    finally:
        ParquetMergeTable._CHECKPOINT_EVERY = orig_every
        ParquetMergeTable._CKPT_SPARK_MIN = 4_000_000
    assert calls["files"] == 0
    assert "ckpt" in t._manifest(2)
    expected = {k: files[k] for k in keep}
    expected.update(added)
    cold = _fresh(spark, tmp_path / "tbl")
    assert cold._files(2) == expected


def test_checkpoint_xjson_fallback_roundtrips_noncanonical(spark, tmp_path):
    """Entries outside the canonical zone-map shape (legacy bare
    dicts, unknown keys, bool-typed stats) ride the checkpoint's
    xjson column VERBATIM: full resolve reproduces them bit-for-bit
    and the lazy classification still matches the dict twins."""
    t = _fresh(spark, tmp_path / "tbl")
    n = ParquetMergeTable._CKPT_INLINE_MAX + 50
    files = {_key(i): _entry(i) for i in range(n)}
    weird = {
        "w0.parquet": {"id": {"min": 5, "max": 9}},       # legacy bare
        "w1.parquet": {"rows": 7, "cols": {"id": {"min": 1, "max": 2}},
                       "custom": ["x"]},                  # unknown key
        "w2.parquet": {"rows": 3, "cols": {"id": {"min": True,
                                                  "max": False}}},
        "w3.parquet": {"rows": 2, "cols": {"v": {"min": 0.1,
                                                 "max": float("inf")}}},
    }
    files.update(weird)
    _publish_full(t, 1, files)
    man = t._manifest(1)
    assert "ckpt" in man

    cold = _fresh(spark, tmp_path / "tbl")
    assert cold._files(1) == files                 # bit-exact resolve

    cold2 = _fresh(spark, tmp_path / "tbl")
    ranges = {"id": (3, 7)}
    keys, _, _, za = cold2._zone_arrays(1, ["id"])
    keep, cont = cold2._mask_range(za, len(keys), ranges, True)
    for i, k in enumerate(keys):
        assert keep[i] == t._range_keep(files[k], ranges), k
        assert cont[i] == t._range_contained(files[k], ranges), k
