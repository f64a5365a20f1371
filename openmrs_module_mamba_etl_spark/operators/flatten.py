"""EAV flattening — the engine's signature operator.

The reference's core job is transposing the OpenMRS ``obs`` EAV table
("long format", 50+ rows per encounter — reference: README.md:8-12) into one
wide row per encounter with a column per clinical concept
(``mamba_flat_encounter_<type>`` — reference: README.md:252-253,296), either
from a declarative JSON config (reference: README.md:249-253) or by
discovering the column set from the data (reference: README.md:246-248).

Spark-first realization — one shuffle, no self-joins, no pivot operator:

    obs.groupBy(entity).agg(
        max_by(CASE WHEN attr=a THEN value END,
               CASE WHEN attr=a THEN ts END) AS col_a, ...)

- The attribute list is *explicitly pre-discovered* (distinct-scan phase) so
  the plan is deterministic for any attribute domain — the two-phase dynamic
  pivot idiom, minus ``DataFrame.pivot`` itself: Spark plans
  ``pivot().agg(max_by)`` as two hash aggregates with two exchanges, while
  one conditional ``max_by`` per output column is a single hash aggregate.
- ``max_by`` gives latest-wins semantics for repeated obs per (entity,
  attribute) inside the aggregate — no extra window pass, and partial
  aggregation runs map-side before the shuffle, so the shuffled volume is
  ≤ one row per (entity, map-task) regardless of the EAV blow-up factor.
  At 100 TB that map-side combine is the difference between shuffling the
  obs table and shuffling the (much smaller) flattened table.
- The reference's 40-column physical cap and >160-column failure
  (reference: README.md:130-131,154) are MySQL row-width workarounds;
  columnar Parquet needs no column partitioning, so the cap is accepted in
  configs but intentionally not enforced.
"""

from __future__ import annotations

import re
import unicodedata
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class FlattenSpec:
    """Column roles of the long (EAV) input + output naming rules."""

    entity_col: str = "encounter_id"  # becomes one output row per value
    attr_col: str = "concept"  # becomes output columns
    value_col: str = "value"
    order_col: str | None = "obs_datetime"  # latest-wins tiebreak; None=any
    carry_cols: tuple[str, ...] = ()  # entity-level cols copied through
    max_attrs: int = 10_000  # guard rail for runaway attribute domains


def sanitize_column(name: str) -> str:
    """Concept display name → safe, stable Spark/Parquet column name."""
    norm = unicodedata.normalize("NFKD", name).encode("ascii", "ignore").decode()
    norm = re.sub(r"[^0-9a-zA-Z]+", "_", norm).strip("_").lower()
    if not norm:
        norm = "col"
    if norm[0].isdigit():
        norm = f"_{norm}"
    return norm


def assign_column_names(attrs: list[str]) -> dict[str, str]:
    """Deterministic attr→column mapping with collision-safe suffixes.

    Attributes are processed in sorted order so the same attribute domain
    always yields the same schema (stable across runs and partitions).
    """
    mapping: dict[str, str] = {}
    used: set[str] = set()
    for attr in sorted(attrs):
        base = sanitize_column(attr)
        name = base
        i = 2
        while name in used:
            name = f"{base}_{i}"
            i += 1
        used.add(name)
        mapping[attr] = name
    return mapping


def discover_attrs(df: DataFrame, spec: FlattenSpec) -> list[str]:
    """Phase 1 of the dynamic pivot: distinct attribute scan.

    A sorted-distinct over one column — Catalyst prunes the scan to just
    ``attr_col`` (check ReadSchema), and partial distinct runs map-side.
    """
    rows = (
        df.select(spec.attr_col)
        .where(F.col(spec.attr_col).isNotNull())
        .distinct()
        .limit(spec.max_attrs + 1)
        .collect()
    )
    if len(rows) > spec.max_attrs:
        raise ValueError(
            f"attribute domain exceeds max_attrs={spec.max_attrs}; "
            "pass an explicit column mapping instead of dynamic discovery"
        )
    return sorted(r[0] for r in rows)


def flatten(
    df: DataFrame,
    spec: FlattenSpec = FlattenSpec(),
    attrs: list[str] | None = None,
    column_mapping: dict[str, str] | None = None,
) -> DataFrame:
    """Long EAV → one wide row per entity (phase 2: explicit pivot).

    ``attrs``: pivot value list; discovered via :func:`discover_attrs` when
    omitted. ``column_mapping`` (output column → attribute, the reference's
    JSON config shape) restricts and renames the pivoted columns.
    """
    if column_mapping:
        attrs = sorted(set(column_mapping.values()))
        attr_to_col = {a: c for c, a in column_mapping.items()}
    else:
        if attrs is None:
            attrs = discover_attrs(df, spec)
        attr_to_col = assign_column_names(attrs)

    # Conditional aggregation instead of DataFrame.pivot(): Spark plans
    # ``pivot().agg(max_by)`` as TWO hash aggregates with TWO exchanges
    # (per-(entity,attr) max_by, then pivotfirst per entity). One
    # max_by(CASE...) per output column collapses that into a single hash
    # aggregate — one shuffle of at most one row per (entity, map-task),
    # with all the latest-wins logic running map-side. Measured on the plan:
    # 2 Exchanges → 1.
    agg_cols = []
    for a in attrs:
        cond = F.col(spec.attr_col) == F.lit(a)
        v = F.when(cond, F.col(spec.value_col))
        if spec.order_col:
            agg = F.max_by(v, F.when(cond, F.col(spec.order_col)))
        else:
            agg = F.first(v, ignorenulls=True)
        agg_cols.append(agg.alias(attr_to_col[a]))

    group_cols = [spec.entity_col, *spec.carry_cols]
    if not agg_cols:
        return df.select(*group_cols).distinct()
    return df.groupBy(*group_cols).agg(*agg_cols)


def apply_concept_locale(
    obs: DataFrame,
    concept_names: DataFrame,
    spec: FlattenSpec,
    locale: str = "en",
    concept_id_col: str = "concept_id",
    name_col: str = "name",
    locale_col: str = "locale",
) -> DataFrame:
    """Resolve concept-id attributes to locale-preferred display names.

    The reference configures a "preferred concepts locale" and resolves
    flat-table column names in it (reference: README.md:127-128, compiler
    flag ``-l en`` README.md:274-275). Spark realization: filter the concept
    vocabulary to the locale and broadcast-join it onto the obs stream —
    the vocabulary is dimension-sized, so this adds no shuffle to the
    flatten; unresolved ids keep their raw attribute value.
    """
    names = (
        concept_names.where(F.col(locale_col) == locale)
        .select(
            F.col(concept_id_col).cast("string").alias("__cid"),
            F.col(name_col).alias("__cname"),
        )
        .dropDuplicates(["__cid"])
    )
    joined = obs.join(
        F.broadcast(names),
        obs[spec.attr_col].cast("string") == F.col("__cid"),
        "left",
    )
    return joined.withColumn(
        spec.attr_col, F.coalesce(F.col("__cname"), F.col(spec.attr_col))
    ).drop("__cid", "__cname")


#: Canonical mapping of the testdata `events` table onto the obs EAV shape
#: (entity=user, attribute=event type, value, event-time order) — shared by
#: the inventory pivot queries and the clinical demo pipeline so the two
#: access paths can never diverge.
EVENTS_AS_OBS_SPEC = FlattenSpec(
    entity_col="user_id", attr_col="event_type", value_col="value", order_col="ts"
)


@dataclass(frozen=True)
class AutoFlattenResult:
    """One flat table per attribute-domain partition (e.g. encounter type)."""

    tables: dict[str, DataFrame] = field(default_factory=dict)


def auto_flatten_by_type(
    df: DataFrame,
    type_col: str,
    spec: FlattenSpec = FlattenSpec(),
    table_prefix: str = "mamba_flat_encounter_",
) -> AutoFlattenResult:
    """Automated flattening: one wide table per encounter type.

    The reference auto-generates one config per encounter type when
    ``automated_flattening`` is on (reference: README.md:136-137,246-248).
    Spark analog: one distinct scan over (type, attr) drives N pivots; each
    pivot is an independent job over a type-filtered slice, so types
    parallelize trivially across a cluster and each per-type plan keeps its
    own narrow attribute list.
    """
    pairs = (
        df.select(type_col, spec.attr_col)
        .where(F.col(type_col).isNotNull() & F.col(spec.attr_col).isNotNull())
        .distinct()
        .collect()
    )
    by_type: dict[str, list[str]] = {}
    for r in pairs:
        by_type.setdefault(str(r[0]), []).append(r[1])

    tables = {}
    for etype, attrs in sorted(by_type.items()):
        name = table_prefix + sanitize_column(etype)
        sliced = df.where(F.col(type_col) == etype)
        tables[name] = flatten(sliced, spec, attrs=sorted(attrs))
    return AutoFlattenResult(tables=tables)


def run_per_type(
    result: "AutoFlattenResult | dict[str, DataFrame]",
    action: Callable[[str, DataFrame], object],
    max_concurrency: int = 8,
) -> dict[str, object]:
    """Run ``action(name, df)`` over every named table CONCURRENTLY.
    Accepts an AutoFlattenResult or any name→DataFrame mapping (the
    pipeline's table dict uses the same fan-out).

    The per-type plans are independent Spark jobs; submitting them from a
    driver for-loop serializes wall-clock on the driver even though the
    cluster is idle between jobs — at hundreds of encounter types
    (reference: one table per type, README.md:246-248) that is the
    bottleneck. A thread pool submits up to ``max_concurrency`` jobs at
    once and Spark's scheduler interleaves their stages, so wall-clock
    approaches max(job) rather than sum(job). Results keep deterministic
    (sorted-name) ordering; the first failure propagates after all
    submitted jobs settle.
    """
    from concurrent.futures import ThreadPoolExecutor

    tables = result.tables if isinstance(result, AutoFlattenResult) else result
    names = sorted(tables)
    with ThreadPoolExecutor(
        max_workers=max(1, min(max_concurrency, len(names) or 1))
    ) as pool:
        futures = {
            name: pool.submit(action, name, tables[name]) for name in names
        }
        return {name: futures[name].result() for name in names}


def write_auto_flatten(
    result: AutoFlattenResult,
    base_path: str,
    mode: str = "overwrite",
    max_concurrency: int = 8,
) -> dict[str, str]:
    """Write every per-type flat table under ``base_path/<name>`` in
    parallel; returns name → path."""
    import os

    def _write(name: str, df: DataFrame) -> str:
        path = os.path.join(base_path, name)
        df.write.mode(mode).parquet(path)
        return path

    return run_per_type(result, _write, max_concurrency=max_concurrency)  # type: ignore[return-value]
