"""Incremental refresh on plain Parquet — watermark + upsert merge.

The reference's incremental mode "only adds/modifies what has changed"
(reference: README.md:133-134; omod/src/main/resources/_etl/
sp_mamba_data_processing_etl.sql:5 takes ``IN etl_incremental_mode INT``).
MySQL does row-level UPSERTs; plain Parquet has no MERGE, so the engine uses
the standard lakehouse-less pattern:

1. **Watermark scan**: read only source rows with audit timestamp greater
   than the stored watermark (predicate pushed down to the Parquet/JDBC
   scan — at 100 TB this is the difference between scanning a day and
   scanning the lake).
2. **Upsert merge**: ``base ANTI-JOIN changed_keys UNION changed_rows``.
   The anti-join broadcasts the changed-key set when small (the common
   incremental case), so the rewrite is a broadcast hash anti-join — no
   shuffle of the base table.
3. **Partition overwrite**: when the target is partitioned by a stable
   column (e.g. date), only affected partitions are rewritten
   (``partitionOverwriteMode=dynamic``) instead of the whole table.

Publish semantics: refresh targets default to **versioned (reader-atomic)
publishes** through :class:`~openmrs_module_mamba_etl_spark.sources.txnlog.
VersionedParquetTable` — a new snapshot appears as one atomic manifest
claim, so a concurrent reader (a report query hitting the analysis table
mid-refresh) always resolves a complete committed version; there is no
between-renames ENOENT window and no freed-paths hazard for a reader that
listed files before the swap. ``versioned=False`` keeps the plain-layout
staging-dir swap (crash-safe but not reader-atomic) for targets that must
stay directly ``spark.read.parquet``-able.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F


def _swap_dir(staging: str | os.PathLike, live: str | os.PathLike) -> None:
    """Promote a fully-written staging dir to the live path with no
    zero-copies window: rename the old live dir ASIDE (atomic), rename
    staging IN (atomic), then delete the old data. The previous
    delete-then-rename order had a crash window between ``rmtree(live)``
    and ``os.replace`` in which NEITHER the old nor the new table
    existed; here a crash between the renames leaves the previous table
    intact at ``<live>.old`` (cleared on the next successful swap). Same
    single-filesystem constraint as ``os.replace`` itself."""
    import shutil

    live = Path(live)
    old = Path(f"{live}.old")
    shutil.rmtree(old, ignore_errors=True)  # stale .old from a crashed run
    if live.exists():
        os.replace(live, old)
    os.replace(staging, live)
    shutil.rmtree(old, ignore_errors=True)


def _versioned_table(target_path: str | os.PathLike):
    from openmrs_module_mamba_etl_spark.sources.txnlog import (
        VersionedParquetTable,
    )

    return VersionedParquetTable(target_path)


def read_published(spark: SparkSession, target_path: str) -> DataFrame:
    """Read a published target regardless of its publish layout.

    The one call report/reader code needs: resolves the versioned log's
    latest committed snapshot when the target was published
    reader-atomically (the default), or the plain parquet files when it
    was published with ``versioned=False``. Raises ``FileNotFoundError``
    when nothing has been published yet."""
    base = _read_base(spark, target_path)
    if base is None:
        raise FileNotFoundError(
            f"no published table at {target_path} (no committed version, "
            "no plain parquet files)"
        )
    return base


def _read_base(spark: SparkSession, target_path: str) -> DataFrame | None:
    """Current committed snapshot of ``target_path``, or None when no
    target exists yet. Layout-driven regardless of the publish mode: a
    versioned log under the path always wins; a plain-parquet legacy
    layout is still readable as the base (it migrates into the log on
    this tick's versioned publish).

    A pre-existing PARTITIONED legacy table (``key=value`` directories,
    no committed log version) cannot be silently treated as a first run —
    the tick would rebuild the full snapshot from the source (silent full
    rebuild cost) and leave the old partition directories as orphaned
    storage (round-9 verdict task 2) — so it REFUSES with a pointed
    error: run :func:`migrate_partitioned` once, then tick normally."""
    vt = _versioned_table(target_path)
    if vt.latest_version() is not None:
        return vt.read(spark)
    parts = _partition_dirs(target_path)
    if parts:
        raise PartitionedLegacyLayout(
            f"{target_path} holds a key=value-partitioned plain-parquet "
            f"layout ({parts[0].name}, ...) with no committed log version. "
            "Treating it as a first run would silently rebuild the full "
            "snapshot and orphan the partition directories — run "
            "migrate_partitioned(spark, target_path) once to publish the "
            "existing data into the versioned log, then retry."
        )
    legacy = _plain_part_files(target_path)
    if legacy:
        # explicit file list, not the directory: a crashed first versioned
        # commit can leave a manifest-less ``_files/`` staging dir next to
        # the legacy part files, and a directory read would recurse into it
        return spark.read.parquet(*[str(f) for f in legacy])
    return None


class PartitionedLegacyLayout(RuntimeError):
    """A pre-log ``key=value``-partitioned target needs a one-call
    migration (:func:`migrate_partitioned`) before versioned ticks."""


def _partition_dirs(target_path: str | os.PathLike) -> list[Path]:
    """Top-level Hive-style ``key=value`` partition directories of a
    pre-log layout. The log's own directories (``_txn``, ``_files``, the
    pre-round-10 ``files``) never contain ``=`` in their names."""
    p = Path(target_path)
    if not p.is_dir():
        return []
    return sorted(
        d for d in p.iterdir()
        if d.is_dir() and "=" in d.name and not d.name.startswith((".", "_"))
    )


def migrate_partitioned(
    spark: SparkSession, target_path: str, keep_versions: int = 2
) -> DataFrame:
    """One-call migration of a pre-log ``key=value``-partitioned plain
    Parquet target into the versioned log (round-9 verdict task 2).

    Reads the partitioned layout WITH its partition columns (``basePath``
    + explicit partition-dir list, so a crashed ``_files`` staging dir is
    never swept in), commits it as version 0 of the log, and removes the
    old partition directories only AFTER the commit — a crash
    mid-migration leaves both layouts intact with the log authoritative,
    exactly like the plain-file migration in :func:`_publish`. The next
    incremental tick then reads the migrated base and is
    churn-proportional, not a rebuild.

    Cost: one full read+write of the table, run once. At 100 TB that is
    a deliberate, visible migration job — the alternative the refusal in
    :func:`_read_base` prevents was the SAME full rewrite happening
    silently on every deploy that repointed a tick at a legacy store,
    plus permanently orphaned partition directories.

    A crash between the commit and the partition-dir cleanup is NOT a
    stuck state: re-running finishes the cleanup without rewriting (the
    log stays authoritative), and every later versioned ``_publish``
    also sweeps leftover pre-log partition dirs post-commit — the same
    self-heal the plain-file migration path has always had."""
    vt = _versioned_table(target_path)
    parts = _partition_dirs(target_path)
    if vt.latest_version() is not None:
        if parts:
            # committed log + leftover partition dirs = a migration that
            # crashed between commit and cleanup; finish the cleanup
            _remove_partition_dirs(target_path, parts)
            return vt.read(spark)
        raise ValueError(
            f"{target_path} already has a committed log version "
            f"({vt.latest_version()}); nothing to migrate"
        )
    if not parts:
        raise FileNotFoundError(
            f"no key=value partition directories under {target_path}; "
            "migrate_partitioned only handles the partitioned pre-log "
            "layout (plain part files migrate automatically on the next "
            "versioned publish)"
        )
    stray = _plain_part_files(target_path)
    if stray:
        # a mixed layout (top-level part files NEXT TO partition dirs) is
        # not something Spark writes; migrating only the partition dirs
        # would let the post-commit sweep delete the stray files unread —
        # refuse and make the operator decide what they are
        raise RuntimeError(
            f"{target_path} mixes top-level parquet part files "
            f"({stray[0].name}, ...) with key=value partition dirs; "
            "refusing to migrate — move the stray files aside (or into "
            "a partition) first, then re-run migrate_partitioned"
        )
    df = (
        spark.read.option("basePath", str(target_path))
        .parquet(*[str(d) for d in parts])
    )
    return _publish(
        spark,
        df,
        target_path,
        versioned=True,
        keep_versions=keep_versions,
        expected_partition_sweep=True,
    )


def _remove_partition_dirs(
    target_path: str | os.PathLike, parts: list[Path], announce: bool = True
) -> None:
    """Post-commit cleanup of a pre-log partitioned layout (shared by
    :func:`migrate_partitioned` and the versioned :func:`_publish`
    self-heal).

    Unless ``announce=False`` (the one caller where the sweep is the
    migration's own documented contract — :func:`migrate_partitioned`'s
    post-commit cleanup of the dirs it just republished), the sweep is
    announced via ``warnings.warn`` naming every
    directory removed (round-10 ADVICE item 2): the self-heal ASSUMES
    coexisting partition dirs are leftovers of a migration that crashed
    between commit and cleanup, but if an operator independently created
    a versioned log at a path still holding an UNMIGRATED partitioned
    dataset, that assumption silently destroys data — the warning makes
    the non-crash coexistence visible in logs/CI before anyone relies on
    the swept path, while keeping the crash-window self-heal unattended."""
    import shutil
    import warnings

    if not parts:
        return
    if announce:
        # stacklevel=2 names the engine call site (migrate_partitioned's
        # crash-window finish or _publish's self-heal) — stable enough to
        # grep, and the message itself carries the operator-relevant
        # facts (path + every directory swept)
        warnings.warn(
            f"removing pre-log partition directories under {target_path} "
            f"superseded by the committed versioned log: "
            f"{', '.join(d.name for d in parts)} — if these were NOT "
            "leftovers of a crashed migrate_partitioned run, restore them "
            "from the source and investigate how a versioned log was "
            "committed alongside unmigrated data",
            stacklevel=2,
        )
    for d in parts:
        shutil.rmtree(d, ignore_errors=True)
    (Path(target_path) / "_SUCCESS").unlink(missing_ok=True)


def _plain_part_files(target_path: str | os.PathLike) -> list[Path]:
    """Top-level legacy parquet part files under a target (the pre-log
    layout); the log's own data lives under ``_files/`` (or the
    pre-round-10 ``files/``) and is excluded."""
    p = Path(target_path)
    if not p.is_dir():
        return []
    return [
        f
        for f in p.iterdir()
        if f.is_file()
        and f.name.endswith(".parquet")
        and not f.name.startswith((".", "_"))
    ]


def _publish(
    spark: SparkSession,
    merged: DataFrame,
    target_path: str,
    versioned: bool,
    keep_versions: int = 2,
    expected_partition_sweep: bool = False,
) -> DataFrame:
    """Publish ``merged`` as the new committed snapshot of ``target_path``.

    ``versioned=True`` (default): one atomic manifest claim via the
    transaction log — readers that resolved the previous manifest keep a
    complete immutable snapshot, readers arriving after the claim see the
    new one, and no reader can ever observe a missing or half-written
    table. ``vacuum(keep_last=keep_versions)`` bounds storage while
    retaining the previous snapshot for in-flight readers; legacy
    top-level part files (a pre-log layout being migrated) are removed
    only AFTER the versioned commit, so a crash mid-migration leaves
    both layouts intact and the log authoritative.

    ``versioned=False``: the plain staging-dir swap — crash-safe (the old
    table survives at ``<live>.old`` until the new one is in place) but a
    concurrent reader can catch the instant between the two renames.
    """
    if versioned:
        vt = _versioned_table(target_path)
        vt.write(merged, mode="overwrite")
        vt.vacuum(keep_last=max(1, keep_versions))
        for legacy in _plain_part_files(target_path):
            legacy.unlink(missing_ok=True)
        # pre-log partition dirs surviving next to a committed log are a
        # migration whose post-commit cleanup crashed; the log is
        # authoritative, so every later publish finishes the sweep —
        # announced unless this IS the migration's own documented cleanup
        # (expected_partition_sweep, set only by migrate_partitioned)
        _remove_partition_dirs(
            target_path,
            _partition_dirs(target_path),
            announce=not expected_partition_sweep,
        )
        return vt.read(spark)
    staging = f"{target_path}.staging"
    merged.write.mode("overwrite").parquet(staging)
    _swap_dir(staging, target_path)
    return spark.read.parquet(target_path)


def merge_upsert(base: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of ``base`` not keyed in ``updates``, plus all of ``updates``.

    Equivalent to ``MERGE ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT``.
    The key set is deduplicated so multi-row updates don't fan out the
    anti-join; Spark/AQE broadcasts it when it is small.
    """
    changed_keys = updates.select(*keys).distinct()
    kept = base.join(F.broadcast(changed_keys), on=keys, how="left_anti")
    return kept.unionByName(updates.select(*base.columns))


class WatermarkStore:
    """Tiny driver-side state store: table name → high-water audit timestamp.

    The reference keeps equivalent state inside MySQL between scheduler ticks
    (reference: mamba_main.sql:11-14 event scheduler + incremental SPs).
    JSON-on-disk is deliberate: watermarks are O(#tables) scalars, not data.
    """

    def __init__(self, path: str | os.PathLike):
        self.path = Path(path)

    def _load(self) -> dict[str, str]:
        if self.path.exists():
            return json.loads(self.path.read_text())
        return {}

    def get(self, table: str) -> str | None:
        return self._load().get(table)

    def set(self, table: str, watermark: str) -> None:
        import fcntl

        self.path.parent.mkdir(parents=True, exist_ok=True)
        # The read-modify-write serializes under an exclusive flock on a
        # SIDECAR lockfile: two pipelines sharing one store but ticking
        # DIFFERENT tables would otherwise race the rewrite and one
        # could drop the other's entry (last-writer-wins — the same
        # failure family as the live-root marker, round 9). The lock
        # must be a sidecar, not the store itself: flock is per-inode
        # and the atomic-replace below swaps the inode, so a waiter
        # locking the store file would acquire a stale inode. A
        # lock-less filesystem (ENOLCK) degrades to the unserialized
        # write, whose worst case is documented-benign below.
        with open(self.path.with_name(self.path.name + ".lock"), "w") as lk:
            try:
                fcntl.flock(lk.fileno(), fcntl.LOCK_EX)
            except OSError:
                pass  # lock-less fs: lost update ⇒ benign re-merge
            state = self._load()
            state[table] = watermark
            # atomic replace: a crash mid-write must never leave a torn
            # JSON file — a corrupt store would fail EVERY subsequent
            # tick at _load, whereas the crash-window semantics of
            # losing one set() are benign (the publish already landed;
            # the next tick simply reprocesses the same updates through
            # the idempotent upsert)
            tmp = self.path.with_name(self.path.name + f".tmp-{os.getpid()}")
            tmp.write_text(json.dumps(state, indent=2, sort_keys=True))
            os.replace(tmp, self.path)


def changed_since(
    df: DataFrame,
    audit_col: str,
    watermark: str | None,
    upper: str | None = None,
) -> DataFrame:
    """Source rows newer than the watermark (pushdown-friendly predicate).

    ``upper`` closes the batch interval (``wm < audit <= upper``): against
    a LIVE source, rows committing while the tick runs must be excluded
    and picked up next tick — advancing the watermark past rows that were
    visible to a later scan but not to the merge loses them forever.

    NULL audit values: an audit-column contract cannot track rows the
    source never stamps — ``audit > wm`` can never match them — so on the
    FIRST-run full build (``watermark is None``) the upper bound keeps
    NULL-audit rows (``audit <= upper OR audit IS NULL``) rather than
    silently dropping them forever. Incremental ticks intentionally skip
    them (they are immutable as far as the audit column can ever tell).
    """
    out = df
    if watermark is not None:
        out = out.where(F.col(audit_col) > F.lit(watermark))
        if upper is not None:
            out = out.where(F.col(audit_col) <= F.lit(upper))
    elif upper is not None:
        out = out.where(
            (F.col(audit_col) <= F.lit(upper)) | F.col(audit_col).isNull()
        )
    return out


def snapshot_watermark(df: DataFrame, audit_col: str) -> str | None:
    """Upper bound for THIS tick's batch, taken BEFORE any processing.

    The bounded-batch pattern: snapshot max(audit) first, process only
    rows at or below it, then advance the stored watermark to exactly this
    value. Rows committing after the snapshot — even if a later scan of a
    live source would see them — belong to the next tick, so no row can
    fall between the processed set and the stored watermark.
    """
    return df.agg(F.max(audit_col).cast("string")).first()[0]


def incremental_flatten_parquet(
    spark: SparkSession,
    obs: DataFrame,
    target_path: str,
    spec,  # operators.flatten.FlattenSpec
    audit_col: str,
    store: WatermarkStore,
    table: str,
    versioned: bool = True,
    keep_versions: int = 2,
) -> DataFrame:
    """Incrementally maintain a flattened (EAV→wide) table on Parquet.

    The reference's incremental mode applied to its signature operator
    (reference: README.md:133-134 + the flat tables of README.md:252-253).
    A changed *obs row* invalidates its whole *entity row* in the wide
    table, so the unit of recomputation is the entity:

    1. watermark scan → changed obs (pushdown predicate);
    2. changed-entity set (distinct, broadcast-sized in steady state);
    3. left-semi join back to obs → ALL obs of changed entities (the wide
       row needs every attribute, not just the new ones);
    4. flatten only those entities; 5. upsert-merge into the wide table.

    Attribute discovery runs on the full obs table each tick so new
    concepts appear as new columns; pre-existing rows get NULL for them
    (schema-drift alignment via unionByName allowMissingColumns).
    Invariant (tested): result ≡ full re-flatten of the current obs.
    """
    from openmrs_module_mamba_etl_spark.operators.flatten import (
        discover_attrs,
        flatten,
    )

    wm = store.get(table)
    batch_wm = snapshot_watermark(obs, audit_col)
    attrs = discover_attrs(obs, spec)
    base = _read_base(spark, target_path)

    if wm is None or base is None:
        merged = flatten(
            changed_since(obs, audit_col, None, upper=batch_wm),
            spec,
            attrs=attrs,
        )
    else:
        changed_entities = (
            changed_since(obs, audit_col, wm, upper=batch_wm)
            .select(spec.entity_col)
            .distinct()
        )
        changed_obs = obs.join(
            F.broadcast(changed_entities), on=spec.entity_col, how="left_semi"
        )
        recomputed = flatten(changed_obs, spec, attrs=attrs)
        # schema drift: new attrs missing in base → filled with NULL
        kept = base.join(
            F.broadcast(changed_entities), on=spec.entity_col, how="left_anti"
        )
        merged = kept.unionByName(recomputed, allowMissingColumns=True)

    out = _publish(spark, merged, target_path, versioned, keep_versions)

    if batch_wm is not None:
        store.set(table, batch_wm)
    return out


def incremental_refresh_parquet(
    spark: SparkSession,
    source: DataFrame,
    target_path: str,
    keys: list[str],
    audit_col: str,
    store: WatermarkStore,
    table: str,
    versioned: bool = True,
    keep_versions: int = 2,
) -> DataFrame:
    """End-to-end incremental tick for one Parquet-backed target table.

    Full refresh on first run (no watermark / no target), merge thereafter;
    advances the watermark to max(audit_col) actually observed. Publishes
    are reader-atomic by default (see :func:`_publish`): a report query
    running against the target mid-refresh always reads one complete
    committed snapshot.
    """
    wm = store.get(table)
    batch_wm = snapshot_watermark(source, audit_col)
    updates = changed_since(source, audit_col, wm, upper=batch_wm)

    base = _read_base(spark, target_path)
    if wm is None or base is None:
        merged = changed_since(source, audit_col, None, upper=batch_wm)
    else:
        merged = merge_upsert(base, updates, keys)

    out = _publish(spark, merged, target_path, versioned, keep_versions)

    if batch_wm is not None:
        store.set(table, batch_wm)
    return out


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    sort_cols: list[str] | None = None,
) -> int:
    """Compact a small-file Parquet table in place; returns new file count.

    Repeated incremental ticks and streaming appends accumulate files far
    below the scan-efficient size; at 100 TB, footer reads and task
    scheduling — not bytes — become the bottleneck. One rewrite:
    target file count = ceil(bytes / target_file_mb), ``repartition`` to
    exactly that, optionally ``sortWithinPartitions`` so min/max row-group
    stats turn point filters into file/row-group skips. Staging-then-swap,
    same non-truncating contract as the refresh writes.

    Per-partition-directory compaction of a ``partitionBy`` table is the
    same routine applied under each partition path; this operator handles
    one directory = one compaction unit.

    A versioned target (one published by the default reader-atomic
    refresh path) is auto-detected and compacted THROUGH the log: the
    rewrite commits as a new overwrite version, so concurrent readers
    keep their snapshot and the compaction inherits the same
    reader-atomicity as the refresh publishes.
    """
    import math

    vt = _versioned_table(path)

    def _count_files(manifest: dict) -> int:
        return len(
            [
                f
                for d in manifest["dirs"]
                for f in vt.data_dir(d).rglob("*.parquet")
                if f.is_file()
            ]
        )

    if vt.latest_version() is not None:
        # Guarded against concurrent publish ticks (round-13: the same
        # glob-to-open TOCTOU class the txnlog soak closed one layer
        # down): the head manifest is resolved ONCE with a retry — a
        # head retired between the latest_version() glob and the open
        # (concurrent publish + post-publish vacuum) restarts the
        # attempt against the new head instead of leaking a raw
        # FileNotFoundError out of a maintenance op — and the rewrite
        # sizes, reads, and commits from that SAME manifest.
        for _ in range(20):
            head = vt.latest_version()
            if head is None:
                raise FileNotFoundError(
                    f"no committed version under {path} (log emptied "
                    "mid-compaction)"
                )
            try:
                m_head = vt._manifest(head)
            except FileNotFoundError:
                continue  # head retired between glob and open — retry
            # size the rewrite from the LATEST snapshot's directories
            # only — older retained versions' files are not part of what
            # gets compacted and would inflate the target file count
            head_dirs = m_head["dirs"]
            data_files = [
                f
                for d in head_dirs
                for f in vt.data_dir(d).rglob("*.parquet")
                if f.is_file()
            ]
            total_bytes = sum(f.stat().st_size for f in data_files)
            n_files = max(
                1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024))
            )
            try:
                if head_dirs:
                    df = spark.read.parquet(
                        *[str(vt.data_dir(d)) for d in head_dirs]
                    )
                else:
                    df = vt.read(spark, head)  # empty snapshot: schema
                compacted = df.repartition(n_files)
                if sort_cols:
                    compacted = compacted.sortWithinPartitions(*sort_cols)
                v = vt.write(compacted, mode="overwrite")
            except FileNotFoundError:
                continue  # head vacuumed before the read resolved
            except Exception:
                # the rewrite materializes from the head's data dirs; a
                # concurrent publish + vacuum deleting them mid-scan is
                # the retirement race (retry) — anything else is real
                if head in vt.versions():
                    raise
                continue
            vt.vacuum(keep_last=2)
            try:
                return _count_files(vt._manifest(v))
            except FileNotFoundError:
                # our compacted version was superseded AND vacuumed by a
                # concurrent publish before the count: report the files
                # of the snapshot that superseded it (the truthful
                # "files now"), with the same head-retry tolerance
                for _ in range(20):
                    h = vt.latest_version()
                    if h is None:
                        return 0
                    try:
                        return _count_files(vt._manifest(h))
                    except FileNotFoundError:
                        continue
                raise RuntimeError(
                    f"could not resolve a head manifest under {path} "
                    "after 20 attempts (concurrent publishes)"
                ) from None
        raise RuntimeError(
            f"could not compact {path} after 20 attempts against "
            "concurrent publishes"
        )
    else:
        # explicit top-level file list, not the recursive directory read:
        # a crashed first versioned commit leaves a manifest-less staging
        # dir next to the legacy part files, and a recursive read/size
        # would count its data — the exact hazard _read_base avoids the
        # same way (round-9 ADVICE item 4)
        plain = _plain_part_files(path)
        if not plain:
            parts = _partition_dirs(path)
            if parts:
                # same refusal _read_base gives a tick: the data is a
                # pre-log partitioned layout, not an empty table
                raise PartitionedLegacyLayout(
                    f"{path} holds a key=value-partitioned pre-log "
                    f"layout ({parts[0].name}, ...) — run "
                    "migrate_partitioned(spark, path) once, then "
                    "compact_parquet compacts the versioned table"
                )
            raise FileNotFoundError(
                f"no committed version and no plain parquet part files "
                f"under {path}; nothing to compact"
            )
        df = spark.read.parquet(*[str(f) for f in plain])
        data_files = plain
    total_bytes = sum(f.stat().st_size for f in data_files)
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))

    compacted = df.repartition(n_files)
    if sort_cols:
        compacted = compacted.sortWithinPartitions(*sort_cols)

    staging = f"{path}.compacting"
    compacted.write.mode("overwrite").parquet(staging)
    _swap_dir(staging, path)
    return len([f for f in Path(path).rglob("*.parquet") if f.is_file()])
