"""The merge table's change feed as a stream (r10): changes_at (one
commit's CDF from the manifest delta, churn-bounded), export_changes
(the Delta _change_data materialization), stream_changes (a standard
Structured Streaming file source over it — exactly-once per file).

Reference parity note: the reference pipeline re-scrapes and re-loads
whole extracts (parse_and_upload_to_db.py); downstream consumers there
re-read the table. The feed is the 100 TB substitute — consumers tail
commits instead of rescanning the table.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from yelp_data_engineering_pipeline_spark.operators.upsert import (
    ParquetMergeTable,
)


def _rows(df):
    return {(r.id, r.p, r.v, r._change_type, r._commit_version)
            for r in df.collect()}


def _mk_table(spark, root):
    """4 commits over a hive-partitioned table: insert, partition-
    pruned update+insert, a DV keyed delete, and a pure compact."""
    t = ParquetMergeTable(spark, str(root), key="id",
                          partition_by="p")
    t.merge(spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
        "id long, p string, v long"))                       # v1
    t.merge(spark.createDataFrame(
        [(2, "a", 99), (4, "b", 40)],
        "id long, p string, v long"))                       # v2
    t.delete_keys("id", [3], use_deletion_vectors=True)     # v3 (DV)
    t.compact()                                             # v4
    return t


def test_changes_at_equals_changes_between_minus_unchanged(spark,
                                                           tmp_path):
    t = _mk_table(spark, tmp_path / "cf")
    assert t.current_version() == 4

    def between(v):
        return {(r[t.key], r.change_type)
                for r in t.changes_between(v - 1, v)
                .filter(F.col("change_type") != "unchanged").collect()}

    for v in (1, 2, 3, 4):
        got = {(r.id, r._change_type) for r in t.changes_at(v).collect()}
        assert got == between(v), f"version {v}"

    # payloads: post-image for inserts/updates, old image for deletes
    v2 = {(r.id, r._change_type): r.v for r in t.changes_at(2).collect()}
    assert v2 == {(2, "updated"): 99, (4, "inserted"): 40}
    v3 = {(r.id, r._change_type): r.v for r in t.changes_at(3).collect()}
    assert v3 == {(3, "deleted"): 30}
    assert t.changes_at(4).count() == 0        # compact: pure layout
    assert t.changes_at(1).count() == 3        # vs the empty state

    with pytest.raises(ValueError, match="not committed"):
        t.changes_at(9)
    empty = ParquetMergeTable(spark, str(tmp_path / "cf0"), key="id")
    with pytest.raises(ValueError, match="not committed"):
        empty.changes_at(1)


def test_changes_at_reads_only_churned_files(spark, tmp_path):
    """The 100 TB property: a DV-only commit's CDF scans the ONE file
    whose DV moved on each side, not the table — asserted by recording
    every relkeys subset changes_at hands to _scan."""
    t = _mk_table(spark, tmp_path / "cb")
    all_files = set(t._file_keys(3))
    assert len(all_files) >= 2              # p=a and p=b at least

    seen: list[set] = []
    orig = t._scan

    def recording(version, relkeys=None, **kw):
        if relkeys is not None:
            seen.append(set(relkeys))
        return orig(version, relkeys=relkeys, **kw)

    t._scan = recording
    assert {r.id for r in t.changes_at(3).collect()} == {3}
    t._scan = orig
    assert seen, "changes_at never passed a relkeys subset"
    for s in seen:
        assert len(s) <= 1, f"DV-only commit scanned {len(s)} files"


def test_export_and_stream_changes_exactly_once(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "ex")
    assert t.export_changes() == [1, 2, 3, 4]
    assert t.export_changes() == []         # idempotent: all marked

    # markers are finalized with the moved file list; the stage dir
    # left nothing behind
    rec = json.loads(t._backend.get(t._cdf_marker(2)))
    assert rec["files"] is not None
    assert all(f.startswith("v00000002-") for f in rec["files"])
    assert t._backend.list_names(
        os.path.join(t._cdf_dir(), "_stage")) == []

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "feed_out")
    q = (t.stream_changes(max_files_per_trigger=2)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    want = set()
    for v in (1, 2, 3, 4):
        want |= _rows(t.changes_at(v))
    assert _rows(spark.read.parquet(out)) == want

    # a new commit exported later arrives INCREMENTALLY: the same
    # checkpoint replays nothing, appends only v5
    t.merge(spark.createDataFrame([(5, "a", 50)],
                                  "id long, p string, v long"))
    assert t.export_changes() == [5]
    q2 = (t.stream_changes()
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    q2.awaitTermination()
    total = _rows(spark.read.parquet(out))
    assert total == want | _rows(t.changes_at(5))
    assert len(total) == len(want) + 1      # exactly-once: no replays

    with pytest.raises(ValueError, match="no committed version"):
        ParquetMergeTable(spark, str(tmp_path / "ex0"),
                          key="id").stream_changes()


def test_export_claim_crash_repair_and_concurrent_claim(spark,
                                                        tmp_path):
    """A claim without a finalize is a crashed exporter: the next
    export_changes sweeps its partial files and re-exports under a
    fresh token. A FINALIZED marker, conversely, is never re-exported
    (the concurrent-exporter claim contract)."""
    t = _mk_table(spark, tmp_path / "cr")
    # fake a crash on v2: claim marker + one stale partial data file
    claim = {"version": 2, "token": "deadbeef00", "files": None,
             "claimed_at_unix": 0.0}
    t._backend.put(t._cdf_marker(2), json.dumps(claim).encode())
    stale = os.path.join(t._cdf_dir(), "v00000002-deadbeef00-0.parquet")
    t._backend.put(stale, b"not parquet")

    # the crashed claim is BACKLOG, not exported (its rows were never
    # published) — a bare marker-existence check would report a green
    # feed here
    plan = t.maintenance_plan()["change_feed"]
    assert plan == {"exported_up_to": 0, "backlog": 4}

    done = t.export_changes()
    assert done == [1, 2, 3, 4]
    assert not os.path.exists(stale)        # partial swept
    rec = json.loads(t._backend.get(t._cdf_marker(2)))
    assert rec["files"] and rec["token"] != "deadbeef00"
    # every visible data file is referenced by exactly one marker
    visible = {f for f in t._backend.list_names(t._cdf_dir())
               if f.endswith(".parquet")}
    referenced = set()
    for v in (1, 2, 3, 4):
        referenced |= set(json.loads(
            t._backend.get(t._cdf_marker(v)))["files"])
    assert visible == referenced

    # finalized markers stay claimed forever
    assert t.export_changes() == []


def test_changes_at_sees_dv_on_escaped_partition(spark, tmp_path):
    """Regression (r10 review): the manifest's dv section keys files
    in URI form (p=a%20b/...), _file_keys in fs form (p=a b/...) —
    changes_at must bridge with unquote like every other DV consumer,
    else a DV delete on an escaped partition reads as 'unchanged' and
    silently vanishes from the feed (and from any replica)."""
    t = ParquetMergeTable(spark, str(tmp_path / "esc"), key="id",
                          partition_by="p")
    t.merge(spark.createDataFrame(
        [(1, "a b", 10), (2, "a b", 20), (3, "c", 30)],
        "id long, p string, v long"))
    t.delete_keys("id", [1], use_deletion_vectors=True)
    assert any("%20" in k for k in
               (t._manifest(2).get("dv") or {}))     # fixture honest
    got = {(r.id, r._change_type) for r in t.changes_at(2).collect()}
    assert got == {(1, "deleted")}


def test_maintenance_plan_change_feed_leg(spark, tmp_path):
    """The plan reports the unexported backlog once a feed exists —
    and stays silent (leg None) on tables that never exported."""
    t = _mk_table(spark, tmp_path / "mp")
    assert t.maintenance_plan()["change_feed"] is None  # no feed yet
    assert t.export_changes() == [1, 2, 3, 4]
    plan = t.maintenance_plan()
    assert plan["change_feed"] == {"exported_up_to": 4, "backlog": 0}
    assert "export_changes()" not in plan["actions"]
    t.merge(spark.createDataFrame([(7, "a", 70)],
                                  "id long, p string, v long"))
    plan = t.maintenance_plan()
    assert plan["change_feed"] == {"exported_up_to": 4, "backlog": 1}
    assert "export_changes()" in plan["actions"]


def test_replication_stream_mirrors_source(spark, tmp_path):
    """The feed drives a REPLICA table (run_replication_stream =
    stream_changes → the CDC conditional merge with _commit_version
    as the monotone): after each export+drain the replica's row set
    equals the source snapshot at the highest exported version —
    across updates, DV deletes, compaction no-ops and a catch-up
    batch spanning several commits; a re-drain with nothing new is a
    no-op."""
    from yelp_data_engineering_pipeline_spark.streaming.ingest import (
        run_replication_stream,
    )

    t = _mk_table(spark, tmp_path / "src")
    t.export_changes()
    rep_root = str(tmp_path / "replica")
    ckpt = str(tmp_path / "rep_ckpt")

    def src_rows(version=None):
        return {(r.id, r.p, r.v)
                for r in t.read(version=version).collect()}

    def rep_rows():
        rep = ParquetMergeTable(spark, rep_root, key="id")
        return {(r.id, r.p, r.v)
                for r in rep.read().drop("_commit_version").collect()}

    run_replication_stream(spark, t, rep_root, ckpt)
    assert rep_rows() == src_rows()
    rep = ParquetMergeTable(spark, rep_root, key="id")
    caught_up = rep.read().agg(
        F.max("_commit_version")).collect()[0][0]
    # v3 only DELETED (no surviving row carries it), v4 was a pure
    # compact (zero feed rows): the newest surviving write is v2
    assert caught_up == 2

    # nothing new exported: a re-drain commits nothing
    v_before = rep.current_version()
    run_replication_stream(spark, t, rep_root, ckpt)
    assert ParquetMergeTable(spark, rep_root,
                             key="id").current_version() == v_before

    # two more commits drain in ONE catch-up batch, deletes included
    t.merge(spark.createDataFrame([(1, "a", 11), (9, "b", 90)],
                                  "id long, p string, v long"))
    t.delete_keys("id", [4], use_deletion_vectors=True)
    t.export_changes()
    run_replication_stream(spark, t, rep_root, ckpt)
    assert rep_rows() == src_rows()
    assert 4 not in {r[0] for r in rep_rows()}


def test_feed_survives_churn_vacuum_and_compaction(spark, tmp_path):
    """The feed under aging: 12 mixed commits (merges, DV keyed
    deletes, compactions) with export every 3 commits and vacuum
    AFTER export (the export-before-vacuum discipline) — every
    version stays exportable, no gaps, and one catch-up replication
    at the end reproduces the source exactly. Also pins that vacuum
    never deletes _cdf files (feed retention is independent of
    snapshot retention)."""
    from yelp_data_engineering_pipeline_spark.streaming.ingest import (
        run_replication_stream,
    )

    t = ParquetMergeTable(spark, str(tmp_path / "ch"), key="id",
                          partition_by="p")
    exported: list[int] = []
    rng_rows = [(i, "ab"[i % 2], i * 10) for i in range(40)]
    for step in range(1, 13):
        if step % 5 == 0:
            t.compact()
        elif step % 4 == 0:
            t.delete_keys("id", [step, step + 20],
                          use_deletion_vectors=True)
        else:
            batch = rng_rows[3 * step:3 * step + 3] + [(step, "a",
                                                        step * 1000)]
            t.merge(spark.createDataFrame(
                batch, "id long, p string, v long"))
        if step % 3 == 0:
            exported += t.export_changes()
            t.vacuum(keep_last_n=4)
    exported += t.export_changes()
    assert exported == list(range(1, t.current_version() + 1))  # no gaps
    n_cdf = len([f for f in os.listdir(t._cdf_dir())
                 if f.endswith(".parquet")])
    assert n_cdf > 0

    run_replication_stream(spark, t, str(tmp_path / "ch_rep"),
                           str(tmp_path / "ch_ckpt"))
    src = {(r.id, r.p, r.v) for r in t.read().collect()}
    rep = {(r.id, r.p, r.v)
           for r in ParquetMergeTable(spark, str(tmp_path / "ch_rep"),
                                      key="id").read()
           .drop("_commit_version").collect()}
    assert rep == src
    # vacuum left the feed alone
    assert len([f for f in os.listdir(t._cdf_dir())
                if f.endswith(".parquet")]) == n_cdf


def test_export_claim_phantom_put_recovers_complete_and_unduplicated(
        spark, tmp_path):
    """The storage-fault model applied to the export claim: the
    conditional PUT of a version's marker LANDS but the exporter sees
    a timeout (the ambiguous S3 failure). The failed call must not
    have published any data file for that version; the next
    export_changes treats the landed claim as crashed (files=None),
    re-claims, and completes — the finalized feed has every version
    exactly once and every visible data file referenced by exactly
    one marker."""
    from yelp_data_engineering_pipeline_spark.operators.storage import (
        PosixBackend,
    )

    class PhantomClaimBackend(PosixBackend):
        def __init__(self):
            self.armed = False

        def put_if_absent(self, path, data):
            super().put_if_absent(path, data)
            if self.armed and "_exported" in path:
                self.armed = False
                raise TimeoutError("simulated: claim PUT timed out "
                                   "after landing")

    b = PhantomClaimBackend()
    t = ParquetMergeTable(spark, str(tmp_path / "ph"), key="id",
                          backend=b)
    t.merge(spark.createDataFrame([(1, 10), (2, 20)],
                                  "id long, v long"))
    t.merge(spark.createDataFrame([(2, 99), (3, 30)],
                                  "id long, v long"))

    b.armed = True
    with pytest.raises(TimeoutError):
        t.export_changes()
    # the claim landed (ambiguous failure) but NO data file of any
    # unfinalized version is visible
    rec = json.loads(t._backend.get(t._cdf_marker(1)))
    assert rec["files"] is None
    visible = [f for f in t._backend.list_names(t._cdf_dir())
               if f.endswith(".parquet")]
    assert not any(f.startswith("v00000001-") for f in visible)

    # recovery: under the default grace the young claim is NOT
    # hijacked (it could be an export in flight) — v2 still exports;
    # the version-conditional replica merge tolerates the temporary
    # gap. With grace 0 (no other exporter live) v1 repairs.
    assert t.export_changes() == [2]
    assert t.export_changes(claim_grace_seconds=0) == [1]
    referenced = []
    for v in (1, 2):
        rec = json.loads(t._backend.get(t._cdf_marker(v)))
        assert rec["files"]
        referenced += rec["files"]
    visible = {f for f in t._backend.list_names(t._cdf_dir())
               if f.endswith(".parquet")}
    assert visible == set(referenced)
    assert len(referenced) == len(set(referenced))
    # the feed content is exactly the two commits' CDF — no dupes
    feed = spark.read.parquet(str(tmp_path / "ph" / "_cdf"))
    got = {(r.id, r._change_type, r._commit_version)
           for r in feed.collect()}
    want = set()
    for v in (1, 2):
        want |= {(r.id, r._change_type, r._commit_version)
                 for r in t.changes_at(v).collect()}
    assert got == want
    assert feed.count() == len(want)


def test_vacuum_change_feed_retention(spark, tmp_path):
    """Feed retention: vacuum_change_feed drops old versions' change
    FILES but keeps their markers finalized (empty list + stamp) —
    never re-exported, never reported as backlog; an already-caught-up
    consumer checkpoint is unaffected; a NEW consumer sees the feed
    begin at the retention boundary."""
    from yelp_data_engineering_pipeline_spark.streaming.ingest import (
        run_replication_stream,
    )

    t = _mk_table(spark, tmp_path / "fr")
    assert t.export_changes() == [1, 2, 3, 4]
    # a consumer catches up BEFORE retention
    run_replication_stream(spark, t, str(tmp_path / "fr_rep"),
                           str(tmp_path / "fr_ckpt"))

    assert t.vacuum_change_feed(3) == [1, 2]
    assert t.vacuum_change_feed(3) == []        # idempotent
    vis = {f for f in t._backend.list_names(t._cdf_dir())
           if f.endswith(".parquet")}
    assert vis and not any(f.startswith(("v00000001", "v00000002"))
                           for f in vis)
    rec = json.loads(t._backend.get(t._cdf_marker(1)))
    assert rec["files"] == [] and "vacuumed_at_unix" in rec
    # still counts as exported: no re-export, no backlog
    assert t.export_changes() == []
    assert t.maintenance_plan()["change_feed"] == {
        "exported_up_to": 4, "backlog": 0}

    # the caught-up consumer keeps working across retention: a new
    # commit exports and drains through the SAME checkpoint
    t.merge(spark.createDataFrame([(8, "a", 80)],
                                  "id long, p string, v long"))
    assert t.export_changes() == [5]
    run_replication_stream(spark, t, str(tmp_path / "fr_rep"),
                           str(tmp_path / "fr_ckpt"))
    rep = ParquetMergeTable(spark, str(tmp_path / "fr_rep"), key="id")
    assert {(r.id, r.p, r.v) for r in
            rep.read().drop("_commit_version").collect()} == \
        {(r.id, r.p, r.v) for r in t.read().collect()}

    # a NEW consumer sees only the retained tail of the feed
    feed = spark.read.parquet(str(tmp_path / "fr" / "_cdf"))
    assert set(r._commit_version for r in feed.collect()) <= {3, 4, 5}


def test_concurrent_exporters_race_real_threads(spark, tmp_path):
    """Two exporters race the same table for real: the conditional-PUT
    claim hands each version to exactly one of them (disjoint return
    sets, union complete), young in-flight claims are never hijacked
    (default grace), and the finalized feed holds every commit's rows
    exactly once."""
    import threading

    t = _mk_table(spark, tmp_path / "race")
    results: dict[str, list] = {}
    errs: list = []
    barrier = threading.Barrier(2)

    def worker(name):
        h = ParquetMergeTable(spark, str(tmp_path / "race"), key="id")
        try:
            barrier.wait(timeout=30)
            results[name] = h.export_changes()
        except Exception as e:  # noqa: BLE001 — surfaced below
            errs.append((name, e))

    th = [threading.Thread(target=worker, args=(n,))
          for n in ("a", "b")]
    for x in th:
        x.start()
    for x in th:
        x.join(timeout=300)
    assert not errs, errs
    a, b = results["a"], results["b"]
    assert set(a) & set(b) == set()            # no version twice
    assert sorted(a + b) == [1, 2, 3, 4]        # union complete
    # feed content: every commit exactly once, no duplicate rows
    feed = spark.read.parquet(str(tmp_path / "race" / "_cdf"))
    want = set()
    for v in (1, 2, 3, 4):
        want |= _rows(t.changes_at(v))
    assert _rows(feed) == want
    assert feed.count() == len(want)
    # every visible file referenced by exactly one finalized marker
    referenced = []
    for v in (1, 2, 3, 4):
        rec = json.loads(t._backend.get(t._cdf_marker(v)))
        assert rec["files"] is not None
        referenced += rec["files"]
    visible = {f for f in t._backend.list_names(t._cdf_dir())
               if f.endswith(".parquet")}
    assert visible == set(referenced)
    assert len(referenced) == len(set(referenced))


def test_export_skips_vacuumed_parents(spark, tmp_path):
    """Versions whose parent fell out of retention are underivable —
    export skips them instead of fabricating a diff; the discipline is
    to export BEFORE vacuum (same ordering every CDC retention has)."""
    t = _mk_table(spark, tmp_path / "vp")
    t.vacuum(keep_last_n=2)                 # retains v3, v4
    # v3's parent (v2) is gone: only nothing is exportable until a new
    # commit arrives whose parent (v4) is retained
    assert t.export_changes() == [4]
    t.merge(spark.createDataFrame([(6, "b", 60)],
                                  "id long, p string, v long"))
    assert t.export_changes() == [5]


def test_export_finalize_race_loser_aborts_and_sweeps(spark, tmp_path):
    """ADVICE r10: an exporter that loses its claim mid-export (a
    repairer past the grace window re-claimed the version) must NOT
    finalize — it deletes its own published files and walks away, so
    no version ever has feed files that its finalized marker does not
    list. Simulated by flipping the marker's token while the exporter
    is computing the change set."""
    t = _mk_table(spark, tmp_path / "race")
    orig = ParquetMergeTable.changes_at
    hijacked = {}

    def hijack(self, v, *a, **k):
        if v == 1 and not hijacked:
            rec = json.loads(self._backend.get(self._cdf_marker(1)))
            hijacked["stolen"] = rec["token"]
            rec["token"] = "feedfacece"
            self._backend.put(self._cdf_marker(1),
                              json.dumps(rec).encode())
        return orig(self, v, *a, **k)

    ParquetMergeTable.changes_at = hijack
    try:
        done = t.export_changes()
    finally:
        ParquetMergeTable.changes_at = orig
    assert 1 not in done and done == [2, 3, 4]
    stolen = hijacked["stolen"]
    leftovers = [f for f in t._backend.list_names(t._cdf_dir())
                 if f.startswith(f"v00000001-{stolen}")]
    assert leftovers == []                     # loser's files deleted
    rec = json.loads(t._backend.get(t._cdf_marker(1)))
    assert rec["token"] == "feedfacece" and rec["files"] is None
    # the surviving claim ages out and repairs normally
    rec["claimed_at_unix"] = 0.0
    t._backend.put(t._cdf_marker(1), json.dumps(rec).encode())
    assert t.export_changes() == [1]
    # invariant: every visible feed file is marker-listed
    visible = {f for f in t._backend.list_names(t._cdf_dir())
               if f.endswith(".parquet")}
    referenced = set()
    for v in (1, 2, 3, 4):
        referenced |= set(json.loads(
            t._backend.get(t._cdf_marker(v)))["files"])
    assert visible == referenced


def test_cdf_orphan_sweep_grace_guarded(spark, tmp_path):
    """Feed files no finalized marker lists (finalize-race residue)
    are swept by export_changes/vacuum_change_feed once past the
    grace window — and never while young (they might belong to an
    in-flight exporter)."""
    t = _mk_table(spark, tmp_path / "orph")
    t.export_changes()
    stray = os.path.join(t._cdf_dir(), "v00000002-0ddba11000-9.parquet")
    t._backend.put(stray, b"residue")
    # young: protected
    t.export_changes(claim_grace_seconds=3600)
    assert os.path.exists(stray)
    # aged: swept (grace 0)
    swept = t._sweep_cdf_orphans(0)
    assert swept == ["v00000002-0ddba11000-9.parquet"]
    assert not os.path.exists(stray)
    # marker-listed files untouched
    rec = json.loads(t._backend.get(t._cdf_marker(2)))
    for f in rec["files"]:
        assert os.path.exists(os.path.join(t._cdf_dir(), f))


def test_stream_changes_detects_dropped_or_retyped_columns(
        spark, tmp_path):
    """ADVICE r10: the feed's single-schema stream is only sound for
    ADDITIVE evolution. A marker whose recorded export-time schema
    carries a column the head dropped (or retyped) must fail loudly
    with the boundary version; vacuuming the feed past it restores
    readability."""
    t = _mk_table(spark, tmp_path / "schema")
    t.export_changes()
    # head is fine today
    t.stream_changes()
    # fabricate: v1 was exported when a now-dropped column existed
    rec = json.loads(t._backend.get(t._cdf_marker(1)))
    from pyspark.sql.types import LongType, StructField, StructType
    sch = StructType.fromJson(rec["schema"])
    sch = StructType(list(sch.fields) +
                     [StructField("ghost", LongType(), True)])
    rec["schema"] = sch.jsonValue()
    t._backend.put(t._cdf_marker(1), json.dumps(rec).encode())
    with pytest.raises(ValueError, match="ghost.*dropped.*version 1"):
        t.stream_changes()
    # retype detection
    rec = json.loads(t._backend.get(t._cdf_marker(1)))
    sch = StructType.fromJson(rec["schema"])
    fields = [StructField("v", __import__("pyspark.sql.types",
                                          fromlist=["StringType"]
                                          ).StringType(), True)
              if f.name == "v" else f
              for f in sch.fields if f.name != "ghost"]
    rec["schema"] = StructType(fields).jsonValue()
    t._backend.put(t._cdf_marker(1), json.dumps(rec).encode())
    with pytest.raises(ValueError, match="'v' was retyped"):
        t.stream_changes()
    # vacuum past the boundary: feed is readable again
    t.vacuum_change_feed(2)
    t.stream_changes()


def test_fingerprint_delta_identity_across_churny_history(spark, tmp_path):
    """The abelian audit identity: for EVERY commit kind — insert
    merge, update/insert mix, DV keyed delete, zorder compaction,
    incremental rezorder — content_fingerprint(v) must equal
    content_fingerprint(v-1) + fingerprint_delta(v) exactly, and a
    pure-maintenance commit must delta to zero. This is what lets a
    replica auditor fold O(churn) deltas instead of re-scanning the
    primary at every sync."""
    t = ParquetMergeTable(spark, str(tmp_path / "t"), key="id",
                          partition_by="p")
    t.merge(spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(200)],
        "id long, p int, v double"))                       # v1 insert
    t.merge(spark.createDataFrame(
        [(i, i % 4, -1.0) for i in range(0, 40)]
        + [(1000 + i, (1000 + i) % 4, 7.0) for i in range(10)],
        "id long, p int, v double"))                       # v2 update+insert
    t.delete_keys("id", [3, 7, 11],
                  use_deletion_vectors=True)               # v3 DV move
    t.compact(zorder_by=("id",), target_files=4)           # v4 maintenance
    t.merge(spark.createDataFrame(
        [(i, i % 4, 9.0) for i in range(50, 90)],
        "id long, p int, v double"))                       # v5 churn
    v6 = t.rezorder(only_decayed=True)                     # maybe no-op
    head = t.current_version()
    assert head >= 5

    fps = {v: t.content_fingerprint(version=v)
           for v in range(1, head + 1)}
    for v in range(2, head + 1):
        d = t.fingerprint_delta(v)
        assert fps[v]["rows"] == fps[v - 1]["rows"] + d["rows_delta"], v
        assert (int(fps[v]["hash"])
                == int(fps[v - 1]["hash"]) + int(d["hash_delta"])), v
    # v1 diffs against the empty state: delta IS the fingerprint
    d1 = t.fingerprint_delta(1)
    assert d1["rows_delta"] == fps[1]["rows"]
    assert d1["hash_delta"] == fps[1]["hash"]
    # maintenance commits move nothing
    d4 = t.fingerprint_delta(4)
    assert d4["rows_delta"] == 0 and d4["hash_delta"] == "0", d4
    if v6 > 5:                       # the incremental rezorder ran
        d6 = t.fingerprint_delta(v6)
        assert d6["rows_delta"] == 0 and d6["hash_delta"] == "0", d6
