"""Minimal transaction log over plain Parquet — versioned tables with
atomic commits, snapshot isolation, time travel, and optimistic
concurrency. The same manifest-log design the lakehouse formats
(Delta/Iceberg) build on, reduced to what the engine's sinks need:

- a table is ``path/files/v<k>/*.parquet`` data directories plus a
  ``path/_txn/<k>.json`` manifest per version listing exactly the data
  directories that version comprises;
- readers resolve ONE manifest and read only its directories — a writer
  can never make a reader see a half-committed state, because the
  manifest appears atomically (``os.rename``, POSIX-atomic within a
  filesystem) only after its data is fully written;
- writers commit optimistically: stage data, then try to rename the
  manifest for version k; if k was taken by a concurrent writer, re-read
  the head and retry at k+1 (append semantics compose; overwrite simply
  supersedes);
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
        self._files = self.path / "files"

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

    def history(self) -> list[dict]:
        """One row per version: version, op, #data dirs."""
        return [
            {
                "version": v,
                "op": self._manifest(v)["op"],
                "n_dirs": len(self._manifest(v)["dirs"]),
            }
            for v in self.versions()
        ]

    # ---- write path -----------------------------------------------------

    def write(
        self, df: DataFrame, mode: str = "overwrite", max_retries: int = 20
    ) -> int:
        """Commit ``df`` as a new version; returns the version number.

        ``overwrite`` → the new version comprises only this commit's data;
        ``append`` → previous head's directories plus this commit's.
        Optimistic concurrency: losing a manifest race re-reads the head
        and retries — appends from concurrent writers all land, in some
        serial order.
        """
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode!r}")
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

            dirs = [data_dir]
            if mode == "append" and head is not None:
                dirs = self._manifest(head)["dirs"] + dirs
            manifest = {"version": version, "op": mode, "dirs": dirs}

            tmp = self._txn / f".{version:05d}.json.tmp-{data_dir}"
            tmp.write_text(json.dumps(manifest, indent=2))
            target = self._txn / f"{version:05d}.json"
            try:
                # atomic claim of the version slot: link fails if it exists
                os.link(tmp, target)
            except FileExistsError:
                tmp.unlink()
                shutil.rmtree(self._files / data_dir, ignore_errors=True)
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
        dirs = self._manifest(v)["dirs"]
        return spark.read.parquet(*[str(self._files / d) for d in dirs])

    # ---- maintenance ----------------------------------------------------

    def vacuum(self, keep_last: int = 2) -> list[str]:
        """Drop manifests + data dirs older than the last ``keep_last``
        versions (that are not referenced by a retained version).
        Returns the deleted data directory names."""
        vs = self.versions()
        keep_vs = vs[-keep_last:] if keep_last > 0 else []
        referenced: set[str] = set()
        for v in keep_vs:
            referenced.update(self._manifest(v)["dirs"])
        deleted = []
        for v in vs:
            if v not in keep_vs:
                (self._txn / f"{v:05d}.json").unlink()
        for d in sorted(p.name for p in self._files.iterdir() if p.is_dir()):
            if d not in referenced:
                shutil.rmtree(self._files / d, ignore_errors=True)
                deleted.append(d)
        return deleted
