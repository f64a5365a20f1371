"""Minimal transaction log over plain Parquet — versioned tables with
atomic commits, snapshot isolation, time travel, and optimistic
concurrency. The same manifest-log design the lakehouse formats
(Delta/Iceberg) build on, reduced to what the engine's sinks need:

- a table is ``path/_files/v<k>/*.parquet`` data directories plus a
  ``path/_txn/<k>.json`` manifest per version listing exactly the data
  directories that version comprises (underscore-prefixed on purpose:
  Spark's default file index ignores ``_*`` paths, so a naive
  ``spark.read.parquet(path)`` of a versioned table fails loudly with
  "unable to infer schema" instead of silently recursing into every
  retained version and returning duplicated snapshots — round-9 ADVICE
  item 3; :func:`operators.incremental.read_published` is the documented
  entry point). Tables written by earlier revisions under ``path/files/``
  stay readable: manifests record bare directory names, and reads resolve
  each name against the new root first, then the legacy one;
- readers resolve ONE manifest and read only its directories — a writer
  can never make a reader see a half-committed state, because the
  manifest appears atomically (``os.link`` of the fully-written temp
  file, POSIX-atomic within a filesystem) only after its data is fully
  written;
- writers commit optimistically: stage data, then claim version k's slot
  (a permanent hardlink under ``_txn/slots/`` — see
  :meth:`VersionedParquetTable._claim_and_publish`) and publish the
  manifest; if k was taken by a concurrent writer, re-read the head and
  retry at k+1 (append semantics compose; overwrite simply supersedes).
  Slots are never vacuumed, so a retired version number can never be
  claimed again (no stale-snapshot resurrection), and the slot file
  doubles as a write-ahead record that heals crashed commits;
- ``vacuum`` deletes data directories no retained manifest references.

Relation to the simpler sinks: ``operators/incremental.py`` staging-swap
gives atomic REPLACE of one table; the log generalizes it to multiple
retained versions (audit/rollback/AS OF reads) with the same
no-truncation guarantee. At 100 TB the manifests are O(#directories)
JSON — data volume never passes through the log.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class VersionedParquetTable:
    """One logical table under ``path`` with a manifest-per-version log."""

    def __init__(self, path: str | os.PathLike):
        self.path = Path(path)
        self._txn = self.path / "_txn"
        self._files = self.path / "_files"
        self._legacy_files = self.path / "files"  # pre-round-10 layout
        # permanent version-slot claims (hardlinks to each version's
        # manifest, never vacuumed) — see _claim_and_publish
        self._slots = self._txn / "slots"

    def data_dir(self, d: str) -> Path:
        """Absolute path of manifest data directory ``d``: the current
        ``_files/`` root, falling back to the legacy ``files/`` root for
        directories committed by earlier revisions (manifests store bare
        names, so mixed-root tables read seamlessly). Directories that do
        not exist yet always resolve to the current root."""
        cur = self._files / d
        if cur.exists():
            return cur
        legacy = self._legacy_files / d
        if legacy.exists():
            return legacy
        return cur

    # ---- log inspection -------------------------------------------------

    def versions(self) -> list[int]:
        if not self._txn.exists():
            return []
        out = []
        for p in self._txn.glob("*.json"):
            try:
                out.append(int(p.stem))
            except ValueError:
                continue
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        with open(self._txn / f"{version:05d}.json", encoding="utf-8") as fh:
            return json.load(fh)

    def _retained_manifests(self) -> list[tuple[int, dict]]:
        """(version, manifest) for every version still on disk at read
        time. Tolerates the versions()-glob → manifest-open race against
        a concurrent vacuum: an old manifest unlinked in between simply
        drops out of the listing (exactly as if the glob had run a moment
        later) instead of raising FileNotFoundError out of a log scan —
        which for :meth:`committed_batch_ids` would crash a streaming
        sink mid-batch over a version it never needed."""
        out = []
        for v in self.versions():
            try:
                out.append((v, self._manifest(v)))
            except FileNotFoundError:
                continue  # vacuumed between glob and open
        return out

    def history(self) -> list[dict]:
        """One row per version: version, op, #data dirs."""
        return [
            {"version": v, "op": m["op"], "n_dirs": len(m["dirs"])}
            for v, m in self._retained_manifests()
        ]

    # ---- write path -----------------------------------------------------

    def _claim_and_publish(self, tmp: Path, version: int) -> bool:
        """Atomically claim ``version``'s slot and publish its manifest.

        The round-13 interleaving soak exposed a *slot resurrection* race
        in the old single-link protocol (claim == the manifest file
        itself): once vacuum unlinked an old manifest, its version slot
        became claimable again, so a writer stalled across several
        concurrent commits plus a vacuum could re-create version k BELOW
        the live head — a stale snapshot referencing vacuumed data dirs.

        The claim is therefore a hardlink into ``_txn/slots/<k>`` —
        written once, NEVER vacuumed, so a slot can never be claimed
        twice across the table's whole lifetime (Delta's log-retention
        window solves the same race by time; a permanent O(bytes)
        tombstone per version is cheaper than a clock assumption). The
        slot file IS the manifest (hardlink to the fully-written tmp),
        which makes the claim double as a write-ahead record: a writer
        that crashes between claim and publish leaves a hole that any
        later writer heals by completing the publish from the slot file
        (:meth:`_heal_hole`) — same-inode links make heal/publish
        idempotent. Returns False if the slot was already claimed (lost
        the race; caller retries against the re-read head).
        """
        self._slots.mkdir(parents=True, exist_ok=True)
        slot = self._slots / f"{version:05d}"
        try:
            os.link(tmp, slot)
        except FileExistsError:
            return False
        try:
            os.link(slot, self._txn / f"{version:05d}.json")
        except FileExistsError:
            pass  # a concurrent healer published for us — same inode
        return True

    def _heal_hole(self, version: int) -> None:
        """Complete a crashed (or mid-publish) writer's commit: slot
        claimed but manifest not yet published.

        Heal ONLY a hole at the log's TIP — slot-without-manifest with no
        higher slot (round-13 self-review). A VACUUMED version is also
        slot-without-manifest, and its slot file still carries the old
        manifest, so an unguarded link would republish a retired version
        below the live head — the resurrection the slot protocol exists
        to prevent. The tip test separates the two cases exactly: vacuum
        retires v only when a newer live manifest (hence a higher slot)
        exists, while no writer can ever claim ABOVE a genuine hole (a
        head-read cannot see the unpublished v, so the next claim target
        is v itself, which is taken). The residual check-then-link window
        would need two full commits plus a vacuum — each O(100 ms) of
        parquet I/O — to land between two adjacent syscalls; the same
        order-of-magnitude argument behind Delta's retention window,
        with structure instead of a clock.
        """
        slot = self._slots / f"{version:05d}"
        target = self._txn / f"{version:05d}.json"
        if not slot.exists() or target.exists():
            return
        try:
            max_slot = max(
                (
                    int(p.name)
                    for p in self._slots.iterdir()
                    if p.name.isdigit()
                ),
                default=version,
            )
        except FileNotFoundError:
            return
        if max_slot > version:
            return  # retired (vacuumed) slot, not a tip hole
        try:
            os.link(slot, target)
        except (FileExistsError, FileNotFoundError):
            pass

    def write(
        self,
        df: DataFrame,
        mode: str = "overwrite",
        max_retries: int = 20,
        stats_cols: list[str] | None = None,
    ) -> int:
        """Commit ``df`` as a new version; returns the version number.

        ``overwrite`` → the new version comprises only this commit's data;
        ``append`` → previous head's directories plus this commit's.
        Optimistic concurrency: losing a manifest race re-reads the head
        and retries — appends from concurrent writers all land, in some
        serial order.

        ``stats_cols`` records per-directory min/max of those columns in
        the manifest (one tiny aggregate over the staged data), enabling
        manifest-level pruning in :meth:`read_pruned` — the
        Iceberg/Delta data-skipping layer: a reader with a range
        predicate opens only directories whose [min, max] intersects it,
        without touching any parquet footer of the rest.
        """
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode!r}")
        return self._commit(df, mode, max_retries, stats_cols, meta=None)

    def _commit(
        self,
        df: DataFrame,
        mode: str,
        max_retries: int,
        stats_cols: list[str] | None,
        meta: dict | None,
    ) -> int:
        self._txn.mkdir(parents=True, exist_ok=True)
        self._files.mkdir(parents=True, exist_ok=True)

        import uuid

        for attempt in range(max_retries):
            head = self.latest_version()
            version = 0 if head is None else head + 1
            # writer-unique staging name: two racers targeting the same
            # version slot must never stage into (or vacuum away) each
            # other's data directory
            data_dir = f"v{version:05d}-{uuid.uuid4().hex[:8]}"
            df.write.mode("overwrite").parquet(str(self._files / data_dir))

            stats: dict[str, dict] = {}
            if stats_cols:
                from pyspark.sql import functions as F

                row = df.sparkSession.read.parquet(
                    str(self._files / data_dir)
                ).agg(
                    *[F.min(c).alias(f"lo_{c}") for c in stats_cols],
                    *[F.max(c).alias(f"hi_{c}") for c in stats_cols],
                ).first()
                stats[data_dir] = {
                    c: [row[f"lo_{c}"], row[f"hi_{c}"]] for c in stats_cols
                }

            dirs = [data_dir]
            if mode == "append" and head is not None:
                try:
                    prev = self._manifest(head)
                except FileNotFoundError:
                    # head was superseded AND vacuumed between the
                    # latest_version() glob and this open (a newer commit
                    # plus its post-commit vacuum landed in between) —
                    # the same glob-to-open race the log scans tolerate.
                    # Retry against the new head; the staged data dir is
                    # reused on the next attempt's manifest only if that
                    # attempt wins, so drop it like a lost os.link race.
                    shutil.rmtree(self._files / data_dir, ignore_errors=True)
                    continue
                dirs = prev["dirs"] + dirs
                stats = {**prev.get("stats", {}), **stats}
            manifest = {
                "version": version,
                "op": mode,
                "dirs": dirs,
                "stats": stats,
                # schema travels with the manifest so a version whose dirs
                # all pruned/forgot away still reads back as an EMPTY
                # relation of the right shape (Delta/Iceberg keep schema in
                # metadata for the same reason)
                "schema": df.schema.jsonValue(),
                **(meta or {}),
            }

            tmp = self._txn / f".{version:05d}.json.tmp-{data_dir}"
            tmp.write_text(json.dumps(manifest, indent=2))
            if not self._claim_and_publish(tmp, version):
                tmp.unlink()
                shutil.rmtree(self._files / data_dir, ignore_errors=True)
                # the claimant may have crashed pre-publish: heal the
                # hole so the retry sees the new head, not a stuck slot
                self._heal_hole(version)
                continue  # lost the race — retry against the new head
            tmp.unlink()
            return version
        raise RuntimeError(
            f"could not commit after {max_retries} optimistic retries"
        )

    # ---- read path ------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot read of ``version`` (default: latest). Every file the
        manifest references existed before the manifest appeared, so the
        snapshot is immutable for as long as it is retained."""
        head = self.latest_version()
        if head is None:
            raise FileNotFoundError(f"no committed version under {self.path}")
        v = head if version is None else version
        if v not in self.versions():
            raise FileNotFoundError(
                f"version {v} not in log (have {self.versions()})"
            )
        try:
            m = self._manifest(v)
        except FileNotFoundError:
            # versions()-glob → manifest-open TOCTOU vs a concurrent
            # vacuum: the version existed at the membership check but was
            # retired before the open. Surface the same descriptive error
            # an up-front miss gets, not a raw open() ENOENT.
            raise FileNotFoundError(
                f"version {v} not in log (have {self.versions()})"
            ) from None
        dirs = m["dirs"]
        if not dirs:
            # every dir pruned/forgotten away: an empty snapshot, not an
            # error — schema comes from the manifest (older logs without a
            # recorded schema cannot produce an empty-dirs version, since
            # only schema-recording code paths write one)
            from pyspark.sql.types import StructType

            return spark.createDataFrame(
                [], StructType.fromJson(m["schema"])
            )
        return spark.read.parquet(*[str(self.data_dir(d)) for d in dirs])

    # ---- exactly-once streaming sink ------------------------------------

    def committed_batch_ids(self) -> set[int]:
        return {
            m["batch_id"]
            for _, m in self._retained_manifests()
            if "batch_id" in m
        }

    def append_batch(
        self, df: DataFrame, batch_id: int, stats_cols: list[str] | None = None
    ) -> int | None:
        """Idempotent foreachBatch sink — the exactly-once contract.

        Structured Streaming re-delivers a micro-batch (same ``batch_id``)
        after a failure between sink write and checkpoint commit; a plain
        append would duplicate those rows. Each log commit records its
        ``batch_id`` in the manifest, and a re-delivered batch is a no-op
        (returns None), so sink state is exactly-once REGARDLESS of where
        the stream crashed. The check re-runs inside the optimistic retry
        loop's head re-read, closing the race between two deliveries of
        the same batch.

        Vacuum bounds this memory to the RETAINED versions — safe, because
        the engine only ever re-delivers the last un-checkpointed batch,
        whose commit (if any) is at or near the head and never vacuumed;
        a batch old enough to have been vacuumed away is also old enough
        to be in the stream's checkpoint, so it is never re-offered.
        """
        if batch_id in self.committed_batch_ids():
            return None
        # the race between two concurrent deliveries of the SAME batch is
        # closed by the version-slot claim: both stage, one wins the slot;
        # the loser re-reads the head, sees the batch_id, and aborts here.
        # Each lost race to an OTHER batch re-runs the dedup check then
        # retries — contention is not an error (the round-13 interleaving
        # soak drove 4 concurrent writers past the old 3-attempt budget),
        # so the budget matches write()'s optimistic-retry default; only
        # genuine livelock surfaces.
        max_retries = 20
        for _ in range(max_retries):
            try:
                return self._commit(
                    df,
                    "append",
                    max_retries=1,
                    stats_cols=stats_cols,
                    meta={"batch_id": batch_id},
                )
            except RuntimeError:
                if batch_id in self.committed_batch_ids():
                    return None
        raise RuntimeError(
            f"batch {batch_id}: lost {max_retries} version races to "
            "OTHER batches"
        )

    def read_pruned(
        self,
        spark: SparkSession,
        col: str,
        lo,
        hi,
        version: int | None = None,
    ) -> tuple[DataFrame, int, int]:
        """Range read ``lo <= col <= hi`` with manifest-level skipping.

        Directories whose recorded [min, max] for ``col`` does not
        intersect the requested range are never opened; directories
        without stats are conservatively read. The residual filter is
        still applied (stats prune at directory granularity, correctness
        comes from the predicate). Returns (df, dirs_read, dirs_total) so
        callers — and tests — can see the skipping actually happened.
        """
        head = self.latest_version()
        if head is None:
            raise FileNotFoundError(f"no committed version under {self.path}")
        v = head if version is None else version
        try:
            m = self._manifest(v)
        except FileNotFoundError:
            # vacuumed between the head glob and the open (or the caller
            # named a version that never existed): the same descriptive
            # error read() raises, not a raw open() ENOENT
            raise FileNotFoundError(
                f"version {v} not in log (have {self.versions()})"
            ) from None
        stats = m.get("stats", {})
        keep = []
        for d in m["dirs"]:
            rng = stats.get(d, {}).get(col)
            if rng is None or rng[0] is None or rng[1] is None:
                keep.append(d)  # no stats → cannot skip safely
            elif not (hi < rng[0] or lo > rng[1]):
                keep.append(d)
        from pyspark.sql import functions as F

        if not keep:
            # empty result with the right schema: read the full version
            # lazily and filter to false-equivalent range
            df = self.read(spark, v).where(F.lit(False))
            return df, 0, len(m["dirs"])
        df = spark.read.parquet(
            *[str(self.data_dir(d)) for d in keep]
        ).where(F.col(col).between(F.lit(lo), F.lit(hi)))
        return df, len(keep), len(m["dirs"])

    # ---- maintenance ----------------------------------------------------

    def forget(
        self,
        spark: SparkSession,
        key_col: str,
        keys: list,
        max_retries: int = 20,
    ) -> tuple[int, int, int]:
        """Targeted delete-by-key (the right-to-be-forgotten maintenance
        op): commit a new version WITHOUT the rows whose ``key_col`` is in
        ``keys``, rewriting ONLY the data directories whose recorded
        [min, max] stats can contain a requested key — every other
        directory carries into the new version by reference, so deletion
        cost is proportional to data co-located with the forgotten keys,
        not to table size. Directories without stats are rewritten
        conservatively (correctness first). → (version, dirs_rewritten,
        dirs_total).

        ``keys`` is a bounded driver-side list by contract (deletion
        requests arrive in small batches); it embeds as an ``isin``
        literal so the rewrite is one pruned scan + filter. TRUE erasure
        is ``forget`` followed by ``vacuum(keep_last=1)`` — earlier
        versions retain the rows for time travel until vacuumed, exactly
        like the lakehouse formats.
        """
        import uuid

        from pyspark.sql import functions as F

        for _ in range(max_retries):
            head = self.latest_version()
            if head is None:
                raise FileNotFoundError(
                    f"no committed version under {self.path}"
                )
            try:
                m = self._manifest(head)
            except FileNotFoundError:
                # head superseded and vacuumed between the glob and the
                # open (concurrent commit + post-commit vacuum): retry
                # against the new head, like a lost version-slot race
                continue
            if not keys:  # nothing to erase — and isin() rejects 0 args
                return head, 0, len(m["dirs"])
            stats = m.get("stats", {})
            touched, untouched = [], []
            for d in m["dirs"]:
                rng = stats.get(d, {}).get(key_col)
                if rng is None or rng[0] is None or rng[1] is None:
                    touched.append(d)  # no stats → cannot prove key-free
                elif any(rng[0] <= k <= rng[1] for k in keys):
                    touched.append(d)
                else:
                    untouched.append(d)
            version = head + 1
            if not touched:
                return head, 0, len(m["dirs"])

            # NULL-key rows must survive the rewrite: ~isin() evaluates to
            # NULL (not true) for NULL keys, silently erasing rows the
            # caller never asked to forget — and NULL-only dirs are always
            # "touched" (stats bounds are None), guaranteeing the loss.
            data_dir = f"v{version:05d}-{uuid.uuid4().hex[:8]}"
            try:
                kept = spark.read.parquet(
                    *[str(self.data_dir(d)) for d in touched]
                ).where(
                    F.col(key_col).isNull() | ~F.col(key_col).isin(*keys)
                )
                kept.write.mode("overwrite").parquet(
                    str(self._files / data_dir)
                )
                stats_cols = sorted(
                    {c for s in stats.values() for c in s}
                ) or [key_col]
                row = spark.read.parquet(str(self._files / data_dir)).agg(
                    F.count(F.lit(1)).alias("n"),
                    *[F.min(c).alias(f"lo_{c}") for c in stats_cols],
                    *[F.max(c).alias(f"hi_{c}") for c in stats_cols],
                ).first()
            except Exception:
                # Round-13 soak find: the rewrite materializes from the
                # head manifest's data dirs, and a concurrent commit +
                # vacuum can retire that head — deleting dirs mid-scan
                # (FAILED_READ_FILE). If the head we derived from is no
                # longer retained, this is that race: drop the partial
                # staging and retry against the new head, exactly like a
                # lost version-slot claim. A failure with the head still
                # live is real (corruption/IO) and must surface.
                shutil.rmtree(self._files / data_dir, ignore_errors=True)
                if head not in self.versions():
                    continue
                raise
            new_dirs = list(untouched)
            new_stats = {d: stats[d] for d in untouched if d in stats}
            if row["n"] > 0:
                new_dirs.append(data_dir)
                new_stats[data_dir] = {
                    c: [row[f"lo_{c}"], row[f"hi_{c}"]] for c in stats_cols
                }
            else:  # all rows in the touched dirs were forgotten
                shutil.rmtree(self._files / data_dir, ignore_errors=True)
            manifest = {
                "version": version,
                "op": "forget",
                "dirs": new_dirs,
                "stats": new_stats,
                "n_keys": len(keys),
                "schema": kept.schema.jsonValue(),
            }
            tmp = self._txn / f".{version:05d}.json.tmp-{data_dir}"
            tmp.write_text(json.dumps(manifest, indent=2))
            if not self._claim_and_publish(tmp, version):
                tmp.unlink()
                shutil.rmtree(self._files / data_dir, ignore_errors=True)
                self._heal_hole(version)
                continue  # concurrent commit — re-derive against new head
            tmp.unlink()
            return version, len(touched), len(m["dirs"])
        raise RuntimeError(
            f"could not commit forget after {max_retries} retries"
        )

    def vacuum(self, keep_last: int = 2) -> list[str]:
        """Drop manifests + data dirs older than the last ``keep_last``
        versions (that are not referenced by a retained version).
        Returns the deleted data directory names.

        Concurrent-writer safety: vacuum only ever deletes directories a
        DROPPED manifest referenced (and no retained manifest still
        does). A directory never referenced by any manifest is either an
        in-flight writer's staging area — for the next version slot, or
        for an already-taken slot whose loser is mid-write and about to
        retry — or crash garbage; deleting it under a running write
        would fail that writer with an error its optimistic-retry loop
        cannot absorb, so such orphans are left alone (an age-based
        orphan sweep belongs to a maintenance window, not here).

        ``keep_last`` must be >= 1: version-slot claims under
        ``_txn/slots/`` are permanent by design (they are what makes a
        vacuumed slot un-resurrectable), so emptying the LOG entirely
        with vacuum(0) would leave every slot claimed and the next write
        healing a dangling version 0 — deleting a whole table is the
        caller's ``rmtree``, not a vacuum."""
        if keep_last < 1:
            raise ValueError(f"keep_last must be >= 1, got {keep_last}")
        # _retained_manifests() tolerates the versions()-glob → open race
        # against a CONCURRENT vacuum (two post-commit vacuums from racing
        # _publish calls are a supported scenario): a manifest unlinked in
        # between is already-dropped — its dirs were the other vacuum's to
        # delete — so it simply falls out of the scan instead of raising
        # FileNotFoundError out of a publish tick.
        scanned = self._retained_manifests()
        vs = [v for v, _ in scanned]
        keep_vs = vs[-keep_last:]
        referenced: set[str] = set()
        dropped_refs: set[str] = set()
        for v, m in scanned:
            (referenced if v in keep_vs else dropped_refs).update(m["dirs"])
        deleted = []
        # data dirs BEFORE manifests: a crash between the two loops then
        # leaves dangling dropped MANIFESTS (whose dirs the next vacuum
        # re-derives and re-deletes — self-healing), not unreferenced data
        # dirs, which this method refuses to touch by design and which
        # would therefore leak forever. The rmtrees are ignore_errors and
        # the unlinks missing_ok, so a re-run over a half-finished (or
        # concurrently finishing) vacuum completes cleanly.
        for d in sorted(dropped_refs - referenced):
            # either root: a dropped version may predate the _files layout
            shutil.rmtree(self._files / d, ignore_errors=True)
            shutil.rmtree(self._legacy_files / d, ignore_errors=True)
            deleted.append(d)
        for v in vs:
            if v not in keep_vs:
                (self._txn / f"{v:05d}.json").unlink(missing_ok=True)
        return deleted
