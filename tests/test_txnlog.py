"""Versioned-parquet transaction log: atomicity, time travel, races,
vacuum."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openmrs_module_mamba_etl_spark.sources.txnlog import VersionedParquetTable


def test_write_read_latest(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    v0 = t.write(spark.range(5).toDF("id"))
    assert v0 == 0
    assert t.read(spark).count() == 5


def test_time_travel(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(5).toDF("id"))
    t.write(spark.range(100, 103).toDF("id"), mode="overwrite")
    t.write(spark.range(200, 202).toDF("id"), mode="append")
    assert t.versions() == [0, 1, 2]
    assert {r["id"] for r in t.read(spark, 0).collect()} == set(range(5))
    assert {r["id"] for r in t.read(spark, 1).collect()} == {100, 101, 102}
    assert {r["id"] for r in t.read(spark, 2).collect()} == {
        100, 101, 102, 200, 201,
    }
    assert [h["op"] for h in t.history()] == ["overwrite", "overwrite", "append"]


def test_read_missing_version_raises(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    with pytest.raises(FileNotFoundError, match="no committed version"):
        t.read(spark)
    t.write(spark.range(1).toDF("id"))
    with pytest.raises(FileNotFoundError, match="version 7"):
        t.read(spark, 7)


def test_concurrent_appends_all_land(spark, tmp_path):
    """Two writers racing for the same version slot must BOTH commit
    (one retries at the next version) and no rows may be lost."""
    from concurrent.futures import ThreadPoolExecutor

    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(0, 1).toDF("id"))

    def appender(lo: int) -> int:
        return t.write(
            spark.range(lo, lo + 10).toDF("id"), mode="append"
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        vs = sorted(pool.map(appender, [100, 200]))
    assert vs == [1, 2]
    got = {r["id"] for r in t.read(spark).collect()}
    assert got == {0} | set(range(100, 110)) | set(range(200, 210))


def test_vacuum_keeps_readable_retained_versions(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(5).toDF("id"))
    t.write(spark.range(10, 12).toDF("id"), mode="overwrite")
    t.write(spark.range(20, 22).toDF("id"), mode="append")
    deleted = t.vacuum(keep_last=2)
    assert deleted  # v0's data dir is unreferenced by v1/v2
    assert t.versions() == [1, 2]
    assert {r["id"] for r in t.read(spark, 2).collect()} == {10, 11, 20, 21}
    assert {r["id"] for r in t.read(spark, 1).collect()} == {10, 11}


def test_append_chain_shares_data_dirs(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(3).toDF("id"))
    t.write(spark.range(3, 6).toDF("id"), mode="append")
    m0, m1 = t.history()
    assert m0["n_dirs"] == 1 and m1["n_dirs"] == 2  # reuse, not rewrite


def test_upsert_via_merge_then_overwrite(spark, tmp_path):
    """The MERGE pattern on the log: read head, merge, overwrite-commit —
    old version remains readable (audit/rollback)."""
    from openmrs_module_mamba_etl_spark.operators.incremental import merge_upsert

    t = VersionedParquetTable(tmp_path / "t")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    t.write(base)
    updates = spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string")
    merged = merge_upsert(t.read(spark), updates, ["id"])
    v = t.write(merged, mode="overwrite")
    assert {tuple(r) for r in t.read(spark, v).collect()} == {
        (1, "a"), (2, "B"), (3, "c"),
    }
    assert {tuple(r) for r in t.read(spark, 0).collect()} == {
        (1, "a"), (2, "b"),
    }


def test_manifest_stats_prune_directories(spark, tmp_path):
    """Three appends covering disjoint id ranges: a range read touching one
    range must open exactly one data directory — manifest-level skipping,
    no parquet footer reads for the rest — and still return exact rows."""
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(0, 100).toDF("id"), stats_cols=["id"])
    t.write(
        spark.range(100, 200).toDF("id"), mode="append", stats_cols=["id"]
    )
    t.write(
        spark.range(200, 300).toDF("id"), mode="append", stats_cols=["id"]
    )
    df, read, total = t.read_pruned(spark, "id", 120, 150)
    assert (read, total) == (1, 3)
    assert {r["id"] for r in df.collect()} == set(range(120, 151))
    # range spanning two dirs
    df2, read2, _ = t.read_pruned(spark, "id", 90, 110)
    assert read2 == 2
    assert df2.count() == 21
    # fully outside: nothing read, empty result, schema intact
    df3, read3, _ = t.read_pruned(spark, "id", 1000, 2000)
    assert read3 == 0 and df3.count() == 0 and df3.columns == ["id"]


def test_stats_absent_dirs_read_conservatively(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(0, 10).toDF("id"))  # no stats recorded
    t.write(
        spark.range(100, 110).toDF("id"), mode="append", stats_cols=["id"]
    )
    df, read, total = t.read_pruned(spark, "id", 0, 5)
    assert (read, total) == (1, 2)  # stats-less dir kept, other pruned
    assert df.count() == 6


def test_append_batch_exactly_once(spark, tmp_path):
    """A re-delivered micro-batch (same batch_id) must be a no-op — the
    exactly-once contract under foreachBatch redelivery."""
    t = VersionedParquetTable(tmp_path / "t")
    assert t.append_batch(spark.range(5).toDF("id"), batch_id=0) == 0
    assert t.append_batch(spark.range(5).toDF("id"), batch_id=0) is None
    assert t.append_batch(spark.range(5, 8).toDF("id"), batch_id=1) == 1
    assert t.read(spark).count() == 8
    assert t.committed_batch_ids() == {0, 1}


def test_vacuum_spares_inflight_staging_dirs(spark, tmp_path):
    """Any staged-but-never-referenced data dir (an in-flight writer for
    the next slot OR a same-slot race loser still mid-write) must survive
    vacuum; only dirs referenced exclusively by DROPPED manifests go."""
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(3).toDF("id"))
    t.write(spark.range(5).toDF("id"), mode="overwrite")
    t.write(spark.range(7).toDF("id"), mode="overwrite")
    # in-flight writer staging for version 3 (head is 2)
    inflight = t.path / "_files" / "v00003-deadbeef"
    spark.range(1).toDF("id").write.parquet(str(inflight))
    # same-slot race loser still mid-write at an already-taken version
    loser = t.path / "_files" / "v00001-feedface"
    spark.range(1).toDF("id").write.parquet(str(loser))
    v0_dirs = {d for d in t._manifest(0)["dirs"]}
    deleted = set(t.vacuum(keep_last=2))
    assert deleted == v0_dirs  # exactly the dropped manifest's dirs
    assert inflight.exists() and loser.exists()
    # retained versions still read
    assert t.read(spark, 2).count() == 7


def test_forget_rewrites_only_touched_dirs(spark, tmp_path):
    """forget must carry key-disjoint directories into the new version BY
    REFERENCE (same dir names), rewrite only the dirs whose stats can
    contain a requested key, and keep the pre-erasure snapshot readable
    until vacuum."""
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(0, 100).toDF("id"), stats_cols=["id"])
    t.write(spark.range(100, 200).toDF("id"), mode="append", stats_cols=["id"])
    t.write(spark.range(200, 300).toDF("id"), mode="append", stats_cols=["id"])
    dirs_before = t._manifest(2)["dirs"]

    version, rewritten, total = t.forget(spark, "id", [150, 160])
    assert (version, rewritten, total) == (3, 1, 3)
    dirs_after = t._manifest(3)["dirs"]
    # the two key-disjoint dirs carried over verbatim
    assert set(dirs_before) & set(dirs_after) == {dirs_before[0], dirs_before[2]}
    got = {r["id"] for r in t.read(spark).collect()}
    assert got == set(range(300)) - {150, 160}
    # pre-erasure snapshot still time-travels ...
    assert t.read(spark, 2).count() == 300
    # ... until vacuum drops it
    t.vacuum(keep_last=1)
    assert t.versions() == [3]
    remaining = {
        f.name for f in (t.path / "_files").iterdir() if f.is_dir()
    }
    assert remaining == set(dirs_after)


def test_forget_noop_when_no_dir_can_contain_keys(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(0, 50).toDF("id"), stats_cols=["id"])
    head, rewritten, total = t.forget(spark, "id", [999])
    assert (head, rewritten, total) == (0, 0, 1)
    assert t.latest_version() == 0  # no new version committed


def test_forget_drops_fully_erased_dir(spark, tmp_path):
    """If every row of a touched dir is forgotten, the new manifest must
    not reference an empty data dir."""
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(0, 3).toDF("id"), stats_cols=["id"])
    t.write(spark.range(10, 13).toDF("id"), mode="append", stats_cols=["id"])
    version, rewritten, total = t.forget(spark, "id", [0, 1, 2])
    assert (rewritten, total) == (1, 2)
    assert len(t._manifest(version)["dirs"]) == 1
    assert {r["id"] for r in t.read(spark).collect()} == {10, 11, 12}


def test_forget_without_stats_is_conservative(spark, tmp_path):
    """Dirs committed without stats cannot be proven key-free — forget
    must rewrite them (correctness over speed)."""
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(0, 10).toDF("id"))  # no stats
    version, rewritten, total = t.forget(spark, "id", [5])
    assert (rewritten, total) == (1, 1)
    assert {r["id"] for r in t.read(spark).collect()} == set(range(10)) - {5}


def test_forget_empty_keys_is_noop(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(0, 5).toDF("id"))  # no stats: would be "touched"
    head, rewritten, total = t.forget(spark, "id", [])
    assert (head, rewritten, total) == (0, 0, 1)
    assert t.latest_version() == 0


def test_forget_retains_null_key_rows(spark, tmp_path):
    """NULL-key rows must survive forget: ~isin() is NULL (filtered out)
    for NULL keys, and a NULL-only dir's stats bounds are None so it is
    always rewritten — the unguarded predicate silently destroyed rows the
    erasure was never asked to touch."""
    from pyspark.sql import functions as F

    t = VersionedParquetTable(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "n1"), (None, "n2")],
        "id bigint, payload string",
    )
    t.write(df, stats_cols=["id"])
    version, rewritten, total = t.forget(spark, "id", [1])
    assert rewritten == 1
    got = {
        (r["id"], r["payload"]) for r in t.read(spark).collect()
    }
    assert got == {(2, "b"), (None, "n1"), (None, "n2")}


def test_naive_directory_read_fails_loudly_not_duplicated(spark, tmp_path):
    """round-9 ADVICE item 3: version data lives under underscore-prefixed
    ``_files/`` so Spark's default file index ignores it — an external
    consumer naively reading the table PATH as parquet gets a loud
    schema-inference error, never a silent union of every retained
    version (which duplicated rows with keep_versions >= 2)."""
    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(5).toDF("id"), mode="overwrite")
    t.write(spark.range(5).toDF("id"), mode="overwrite")  # 2 retained
    with pytest.raises(AnalysisException):
        spark.read.parquet(str(t.path)).count()
    # the documented entry point still reads exactly one snapshot
    assert t.read(spark).count() == 5


def test_legacy_files_root_reads_vacuums_and_appends(spark, tmp_path):
    """A table committed by a pre-round-10 revision (data under
    ``files/``) must stay fully usable: reads resolve the legacy root,
    new commits land under ``_files/``, mixed-root versions read
    seamlessly, and vacuum reclaims dropped dirs from EITHER root."""
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(3).toDF("id"), stats_cols=["id"])
    t.write(spark.range(3, 6).toDF("id"), mode="append", stats_cols=["id"])
    # simulate the old layout: everything under files/, not _files/
    (t.path / "files").mkdir()
    for d in (t.path / "_files").iterdir():
        d.rename(t.path / "files" / d.name)
    (t.path / "_files").rmdir()

    assert {r["id"] for r in t.read(spark).collect()} == set(range(6))
    df, read, total = t.read_pruned(spark, "id", 4, 5)
    assert (read, total) == (1, 2) and df.count() == 2

    # a new append commits into _files/ and unions with legacy dirs
    t.write(spark.range(6, 8).toDF("id"), mode="append", stats_cols=["id"])
    assert {r["id"] for r in t.read(spark).collect()} == set(range(8))
    legacy_dirs = {d.name for d in (t.path / "files").iterdir()}
    assert any(
        d.name not in legacy_dirs for d in (t.path / "_files").iterdir()
    )

    # forget rewrites a touched legacy dir into the new root
    version, rewritten, total = t.forget(spark, "id", [1])
    assert rewritten == 1
    assert {r["id"] for r in t.read(spark).collect()} == set(range(8)) - {1}

    # vacuum to the head only: dropped legacy dirs reclaimed from files/
    t.vacuum(keep_last=1)
    head_dirs = set(t._manifest(t.latest_version())["dirs"])
    on_disk = {d.name for d in (t.path / "files").iterdir()} | {
        d.name for d in (t.path / "_files").iterdir()
    }
    assert on_disk == head_dirs


def test_vacuum_crash_state_self_heals(spark, tmp_path):
    """Round-10 review: vacuum deletes data dirs BEFORE manifests, so the
    only possible crash state is a dangling dropped MANIFEST — which the
    next vacuum re-derives and drops — never an unreferenced data dir,
    which vacuum refuses to touch by design and which would leak forever."""
    import shutil

    from openmrs_module_mamba_etl_spark.sources.txnlog import (
        VersionedParquetTable,
    )

    vt = VersionedParquetTable(tmp_path / "t")
    for n in (1, 2, 3):
        vt.write(spark.range(n).toDF("id"), mode="overwrite")
    assert vt.versions() == [0, 1, 2]

    # simulate the mid-vacuum crash: v0's data dir deleted, manifest left
    v0_dirs = vt._manifest(0)["dirs"]
    for d in v0_dirs:
        shutil.rmtree(vt.data_dir(d), ignore_errors=True)

    # the next vacuum completes cleanly and drops the dangling manifest
    vt.vacuum(keep_last=2)
    assert vt.versions() == [1, 2]
    assert vt.read(spark).count() == 3  # head snapshot untouched

    # re-running over an already-clean log is a no-op, not an error
    assert vt.vacuum(keep_last=2) == []


def test_log_scans_tolerate_concurrent_vacuum(spark, tmp_path, monkeypatch):
    """Round-11 review: committed_batch_ids()/history() glob versions()
    then open each manifest — a concurrent vacuum unlinking an OLD
    manifest between the two must drop it from the listing (as if the
    glob ran a moment later), not crash a streaming sink's duplicate
    check with FileNotFoundError over a version it never needed."""
    from openmrs_module_mamba_etl_spark.sources.txnlog import (
        VersionedParquetTable,
    )

    vt = VersionedParquetTable(tmp_path / "t")
    vt.append_batch(spark.range(1).toDF("id"), batch_id=0)
    vt.append_batch(spark.range(2).toDF("id"), batch_id=1)
    vt.append_batch(spark.range(3).toDF("id"), batch_id=2)

    real_manifest = VersionedParquetTable._manifest

    def racy_manifest(self, version):
        if version == 0:  # vacuumed between the glob and this open
            raise FileNotFoundError(self._txn / f"{version:05d}.json")
        return real_manifest(self, version)

    monkeypatch.setattr(VersionedParquetTable, "_manifest", racy_manifest)
    assert vt.committed_batch_ids() == {1, 2}
    assert [h["version"] for h in vt.history()] == [1, 2]
    # a re-delivery of a RETAINED batch still no-ops under the race
    assert vt.append_batch(spark.range(2).toDF("id"), batch_id=2) is None


def test_vacuum_tolerates_concurrent_vacuum(spark, tmp_path, monkeypatch):
    """Round-12 review: vacuum() itself scans manifests over a fresh
    versions() glob, so two concurrent post-commit vacuums (two racing
    _publish ticks on one table — a supported scenario) could hit the
    same glob-to-open race history() already tolerates. A manifest that
    vanishes mid-scan is already-dropped — its dirs were the other
    vacuum's to delete — so this vacuum must complete, not raise."""
    vt = VersionedParquetTable(tmp_path / "t")
    for n in (1, 2, 3, 4):
        vt.write(spark.range(n).toDF("id"))

    real_manifest = VersionedParquetTable._manifest

    def racy_manifest(self, version):
        if version == 0:  # the other vacuum unlinked it between glob+open
            raise FileNotFoundError(self._txn / f"{version:05d}.json")
        return real_manifest(self, version)

    # capture each version's dir set before the race is injected
    dirs = {v: set(vt._manifest(v)["dirs"]) for v in vt.versions()}
    retained = dirs[2] | dirs[3]

    monkeypatch.setattr(VersionedParquetTable, "_manifest", racy_manifest)
    deleted = vt.vacuum(keep_last=2)
    monkeypatch.undo()
    # exactly v1's unshared dirs go: v1 was scanned and dropped, while
    # v0's dirs were the RACING vacuum's job (its manifest vanished
    # mid-scan) — this vacuum must not double-delete them
    assert set(deleted) == dirs[1] - retained
    assert not (set(deleted) & dirs[0])
    # retained head still reads back exactly
    assert vt.read(spark).count() == 4
    assert vt.read(spark, vt.versions()[-2]).count() == 3


def test_read_explicit_version_vacuumed_mid_read(spark, tmp_path, monkeypatch):
    """Round-12 review: read(version=old) checks membership via
    versions() then opens the manifest; a vacuum landing in between must
    surface the same descriptive 'version ... not in log' error an
    up-front miss gets — not a raw open() FileNotFoundError."""
    vt = VersionedParquetTable(tmp_path / "t")
    vt.write(spark.range(1).toDF("id"))
    vt.write(spark.range(2).toDF("id"))

    real_manifest = VersionedParquetTable._manifest

    def racy_manifest(self, version):
        if version == 0:  # vacuumed between the membership check and open
            raise FileNotFoundError(self._txn / f"{version:05d}.json")
        return real_manifest(self, version)

    monkeypatch.setattr(VersionedParquetTable, "_manifest", racy_manifest)
    with pytest.raises(FileNotFoundError, match="version 0 not in log"):
        vt.read(spark, 0)
    # the head is unaffected by the race
    assert vt.read(spark).count() == 2


def test_append_retries_when_head_vacuumed_mid_commit(spark, tmp_path, monkeypatch):
    """Round-12 sweep: the append path opens the head manifest after the
    latest_version() glob; a concurrent commit + post-commit vacuum can
    retire that head in between. The optimistic retry loop must absorb
    the vanished manifest like a lost version-slot race — and drop the
    abandoned staging dir — not leak FileNotFoundError out of write()."""
    vt = VersionedParquetTable(tmp_path / "t")
    vt.write(spark.range(2).toDF("id"))

    real_manifest = VersionedParquetTable._manifest
    calls = {"n": 0}

    def racy_manifest(self, version):
        calls["n"] += 1
        if calls["n"] == 1:  # head vacuumed between glob and first open
            raise FileNotFoundError(self._txn / f"{version:05d}.json")
        return real_manifest(self, version)

    monkeypatch.setattr(VersionedParquetTable, "_manifest", racy_manifest)
    v = vt.write(spark.range(3).toDF("id"), mode="append")
    monkeypatch.undo()
    assert v == 1
    assert vt.read(spark).count() == 5
    # the first attempt's staging dir was dropped: only v0's dir and the
    # winning attempt's dir remain
    data_dirs = [d for d in (tmp_path / "t" / "_files").iterdir() if d.is_dir()]
    assert len(data_dirs) == 2


def test_read_pruned_explicit_version_vacuumed_mid_read(spark, tmp_path, monkeypatch):
    """read_pruned() must surface the same descriptive 'version N not in
    log' error read() raises when the manifest vanishes under it."""
    vt = VersionedParquetTable(tmp_path / "t")
    vt.write(spark.range(4).toDF("id"), stats_cols=["id"])

    def racy_manifest(self, version):
        raise FileNotFoundError(self._txn / f"{version:05d}.json")

    monkeypatch.setattr(VersionedParquetTable, "_manifest", racy_manifest)
    with pytest.raises(FileNotFoundError, match="version 0 not in log"):
        vt.read_pruned(spark, "id", 0, 2)


def test_forget_retries_when_head_vacuumed_mid_commit(spark, tmp_path, monkeypatch):
    """forget()'s retry loop must also absorb a head manifest vacuumed
    between its glob and open, retrying against the re-read head."""
    vt = VersionedParquetTable(tmp_path / "t")
    vt.write(
        spark.range(5).toDF("id").withColumn("k", F.col("id")),
        stats_cols=["k"],
    )

    real_manifest = VersionedParquetTable._manifest
    calls = {"n": 0}

    def racy_manifest(self, version):
        calls["n"] += 1
        if calls["n"] == 1:
            raise FileNotFoundError(self._txn / f"{version:05d}.json")
        return real_manifest(self, version)

    monkeypatch.setattr(VersionedParquetTable, "_manifest", racy_manifest)
    v, touched, total = vt.forget(spark, "k", [2])
    monkeypatch.undo()
    assert v == 1
    rows = {r["k"] for r in vt.read(spark).collect()}
    assert rows == {0, 1, 3, 4}


def test_randomized_interleaving_soak(spark, tmp_path):
    """Round-12 verdict task 2: close the TOCTOU race class WHOLESALE.

    Rounds 11-12 found five glob-to-open races one targeted review at a
    time (head vacuumed mid-append, mid-forget, mid-read, concurrent
    vacuums, log scans). Instead of chasing the class site by site, this
    soak runs every public op concurrently against ONE table — appends,
    overwrites, exactly-once batch appends (with re-deliveries), pruned
    and plain reads, history/batch-id scans, forgets, and continuous
    vacuums — under randomized interleaving, and asserts:

    - no RAW ENOENT ever escapes (``FileNotFoundError`` with ``errno``
      set, i.e. an unguarded ``open()``/``rmtree`` path) — only the
      documented descriptive errors are acceptable, and only from reads
      whose version a concurrent vacuum actually retired;
    - every writer completes (optimistic retries absorb all races);
    - the final log is consistent: head readable, every retained
      manifest's dirs on disk, no leaked staging manifests, re-delivered
      batch ids deduplicated.

    Reference behavior guarded: concurrent scheduled runs — the
    reference's event scheduler has no run-exclusion either
    (reference: api/src/main/resources/mamba/mamba_main.sql:11-14).
    """
    import random
    import threading

    vt = VersionedParquetTable(tmp_path / "t")
    vt.write(
        spark.range(10).toDF("id").withColumn("k", F.col("id") % 5),
        stats_cols=["k"],
    )

    stop = threading.Event()
    failures: list[str] = []
    flock = threading.Lock()

    def fail(who, exc):
        with flock:
            failures.append(f"{who}: {type(exc).__name__}: {exc}")

    def classify_read_exc(who, exc, version_read):
        """Descriptive FNF is the documented contract, and ANY Spark-side
        read error against a version a concurrent vacuum retired is the
        lakehouse undefined-behavior zone (surfaces variously as
        FAILED_READ_FILE, PATH_NOT_FOUND, or UNABLE_TO_INFER_SCHEMA when
        rmtree has emptied but not yet removed a dir). What must NEVER
        escape: a raw ENOENT (FileNotFoundError with errno set — an
        unguarded open() in the log itself), or any error while the read
        version is still retained."""
        if isinstance(exc, FileNotFoundError):
            if getattr(exc, "errno", None) is not None:
                fail(who, exc)  # raw open()/ENOENT escaped a log scan
            return  # descriptive error: documented for vacuumed versions
        if version_read is not None and version_read not in vt.versions():
            return  # snapshot vacuumed mid-materialization: contract
        fail(who, exc)

    def appender(seed):
        rng = random.Random(seed)
        def run():
            try:
                for i in range(6):
                    mode = "append" if rng.random() < 0.8 else "overwrite"
                    n = rng.randint(3, 12)
                    df = spark.range(n).toDF("id").withColumn(
                        "k", F.col("id") % 5
                    )
                    vt.write(df, mode=mode, stats_cols=["k"])
            except Exception as e:  # noqa: BLE001 — soak classifier
                fail(f"appender{seed}", e)
        return run

    def batcher():
        try:
            for b in range(8):
                vt.append_batch(
                    spark.range(4).toDF("id").withColumn(
                        # cast: a sink delivers a STABLE schema — lit()
                        # alone would append int32 next to the appenders'
                        # int64 and turn the soak into a schema-evolution
                        # test the log doesn't claim to pass
                        "k", F.lit(b % 5).cast("long")
                    ),
                    batch_id=b % 5,  # ids 0-4, 5-7 are re-deliveries
                    stats_cols=["k"],
                )
        except Exception as e:  # noqa: BLE001
            fail("batcher", e)

    def vacuumer():
        rng = random.Random(99)
        while not stop.is_set():
            try:
                vt.vacuum(keep_last=rng.choice([1, 2, 3]))
            except Exception as e:  # noqa: BLE001
                fail("vacuumer", e)
                return

    def reader():
        rng = random.Random(7)
        while not stop.is_set():
            v = None
            try:
                op = rng.randrange(4)
                if op == 0:
                    v = vt.latest_version()
                    if v is not None:
                        vt.read(spark, v).count()
                elif op == 1:
                    v = vt.latest_version()
                    if v is not None:
                        df, _, _ = vt.read_pruned(spark, "k", 1, 3, version=v)
                        df.count()
                elif op == 2:
                    vt.history()
                else:
                    vt.committed_batch_ids()
            except Exception as e:  # noqa: BLE001
                classify_read_exc("reader", e, v)

    def forgetter():
        rng = random.Random(13)
        try:
            for _ in range(4):
                vt.forget(spark, "k", [rng.randrange(5)])
        except Exception as e:  # noqa: BLE001
            fail("forgetter", e)

    writers = [
        threading.Thread(target=appender(1)),
        threading.Thread(target=appender(2)),
        threading.Thread(target=batcher),
        threading.Thread(target=forgetter),
    ]
    aux = [threading.Thread(target=vacuumer), threading.Thread(target=reader)]
    for t in writers + aux:
        t.start()
    for t in writers:
        t.join(timeout=300)
    stop.set()
    for t in aux:
        t.join(timeout=60)
    assert not any(t.is_alive() for t in writers + aux), "soak thread hung"
    assert failures == [], "\n".join(failures)

    # final-state consistency: head readable with the right schema...
    head_df = vt.read(spark)
    assert set(head_df.columns) == {"id", "k"}
    head_df.count()
    # ...every retained manifest's dirs actually on disk...
    for v, m in vt._retained_manifests():
        for d in m["dirs"]:
            assert vt.data_dir(d).exists(), f"v{v} references missing dir {d}"
    # ...no leaked staging manifests (losers unlink their tmp files)...
    assert list(vt._txn.glob(".*.tmp-*")) == []
    # ...and exactly-once held: re-deliveries (batch ids 5-7 repeat 0-2)
    # must never have produced a SECOND commit for the same batch id
    # among the retained manifests (subset check alone is tautological —
    # round-13 self-review)
    batch_ids = [
        m["batch_id"]
        for _, m in vt._retained_manifests()
        if "batch_id" in m
    ]
    assert len(batch_ids) == len(set(batch_ids)), batch_ids
    assert set(batch_ids) <= {0, 1, 2, 3, 4}


def test_vacuum_rejects_keep_last_zero(spark, tmp_path):
    """Slots are permanent, so vacuum(0) (empty the log entirely) would
    leave every slot claimed and the next write healing a dangling v0 —
    whole-table deletion is rmtree, not vacuum."""
    vt = VersionedParquetTable(tmp_path / "t")
    vt.write(spark.range(1).toDF("id"))
    with pytest.raises(ValueError, match="keep_last must be >= 1"):
        vt.vacuum(keep_last=0)


def test_vacuumed_slot_cannot_be_reclaimed(spark, tmp_path):
    """Round-13 soak-adjacent fix: under the old protocol (claim == the
    manifest file itself) vacuum unlinking an old manifest RE-OPENED its
    version slot, so a writer stalled across several concurrent commits
    plus a vacuum could resurrect version k below the live head — a
    stale snapshot referencing vacuumed data dirs. Slots are permanent:
    a retired version number is never claimable again."""
    import json as _json

    vt = VersionedParquetTable(tmp_path / "t")
    for n in (1, 2, 3, 4):
        vt.write(spark.range(n).toDF("id"))
    vt.vacuum(keep_last=1)
    assert vt.versions() == [3]

    # the stalled writer's final act: claim+publish at a vacuumed slot
    tmp = vt._txn / ".00001.json.tmp-zzz"
    tmp.write_text(_json.dumps({"version": 1, "op": "append", "dirs": []}))
    assert vt._claim_and_publish(tmp, 1) is False  # slot stays claimed
    tmp.unlink()
    assert vt.versions() == [3]  # no stale version re-appeared
    # ...and the loser path's heal must not resurrect it either (round-13
    # self-review: the vacuumed slot still carries the old manifest, but
    # it is not a TIP hole — higher slots exist — so heal refuses)
    vt._heal_hole(1)
    assert vt.versions() == [3]
    assert vt.read(spark).count() == 4


def test_crashed_commit_healed_by_next_writer(spark, tmp_path):
    """A writer that crashes between slot claim and manifest publish
    leaves a hole; the slot file IS the manifest (write-ahead record),
    so the next writer completes the publish and commits above it."""
    import json as _json
    import os as _os

    vt = VersionedParquetTable(tmp_path / "t")
    vt.write(spark.range(2).toDF("id"))

    # simulate the crash: stage v1's data + claim its slot, never publish
    spark.range(3).toDF("id").write.mode("overwrite").parquet(
        str(vt._files / "v00001-crash"))
    manifest = {
        "version": 1, "op": "append",
        "dirs": vt._manifest(0)["dirs"] + ["v00001-crash"],
        "stats": {},
        "schema": vt.read(spark).schema.jsonValue(),
    }
    tmp = vt._txn / ".00001.json.tmp-crash"
    tmp.write_text(_json.dumps(manifest))
    vt._slots.mkdir(parents=True, exist_ok=True)
    _os.link(tmp, vt._slots / "00001")
    tmp.unlink()
    assert vt.versions() == [0]  # the crashed commit is invisible...

    v = vt.write(spark.range(4).toDF("id"), mode="append")
    # ...until the next writer heals it and commits strictly above it
    assert v == 2
    assert vt.versions() == [0, 1, 2]
    assert vt.read(spark, 1).count() == 5   # healed commit reads back
    assert vt.read(spark).count() == 9      # and the append chained on it
