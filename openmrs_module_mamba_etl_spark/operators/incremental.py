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
        state = self._load()
        state[table] = watermark
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.path.write_text(json.dumps(state, indent=2, sort_keys=True))


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
    target_exists = Path(target_path).exists()

    if wm is None or not target_exists:
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
        base = spark.read.parquet(target_path)
        # schema drift: new attrs missing in base → filled with NULL
        kept = base.join(
            F.broadcast(changed_entities), on=spec.entity_col, how="left_anti"
        )
        merged = kept.unionByName(recomputed, allowMissingColumns=True)

    staging = f"{target_path}.staging"
    merged.write.mode("overwrite").parquet(staging)
    _swap_dir(staging, target_path)

    if batch_wm is not None:
        store.set(table, batch_wm)
    return spark.read.parquet(target_path)


def incremental_refresh_parquet(
    spark: SparkSession,
    source: DataFrame,
    target_path: str,
    keys: list[str],
    audit_col: str,
    store: WatermarkStore,
    table: str,
) -> DataFrame:
    """End-to-end incremental tick for one Parquet-backed target table.

    Full refresh on first run (no watermark / no target), merge thereafter;
    advances the watermark to max(audit_col) actually observed.
    """
    wm = store.get(table)
    batch_wm = snapshot_watermark(source, audit_col)
    updates = changed_since(source, audit_col, wm, upper=batch_wm)

    target_exists = Path(target_path).exists()
    if wm is None or not target_exists:
        merged = changed_since(source, audit_col, None, upper=batch_wm)
    else:
        base = spark.read.parquet(target_path)
        merged = merge_upsert(base, updates, keys)

    # Materialize to a staging dir then swap, so a failed write never
    # truncates the live table (Parquet overwrite is not transactional).
    staging = f"{target_path}.staging"
    merged.write.mode("overwrite").parquet(staging)
    _swap_dir(staging, target_path)

    if batch_wm is not None:
        store.set(table, batch_wm)
    return spark.read.parquet(target_path)


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
    """
    import math

    p = Path(path)
    data_files = [f for f in p.rglob("*.parquet") if f.is_file()]
    total_bytes = sum(f.stat().st_size for f in data_files)
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))

    df = spark.read.parquet(path)
    compacted = df.repartition(n_files)
    if sort_cols:
        compacted = compacted.sortWithinPartitions(*sort_cols)

    staging = f"{path}.compacting"
    compacted.write.mode("overwrite").parquet(staging)
    _swap_dir(staging, path)
    return len([f for f in Path(path).rglob("*.parquet") if f.is_file()])
