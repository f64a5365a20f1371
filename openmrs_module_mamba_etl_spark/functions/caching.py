"""Cache-lifecycle registry for operators that persist() intermediates.

Several operators persist() derived frames that BOTH sides of a self-join
(or several branches of a composite) read — the r13/r14 optimization
rounds' shared-subtree caches. The returned DataFrame is lazy: those
persists populate during the CALLER's terminal action, so the operator
cannot unpersist them itself. Left pinned, each call of such an operator
in a long-lived session (a streaming foreachBatch loop, a report server)
adds cached relations that Spark's CacheManager holds STRONG references
to — unlike localCheckpoint RDDs they are never GC-reclaimed, and at
design scale they are corpus-sized MEMORY_AND_DISK tables competing with
execution memory (guide §5: "unpersist when done").

Convention: an operator ATTACHES its persisted intermediates to the frame
it returns (:func:`attach_caches`); composites that wrap another
operator's frame inherit its attachments. A caller that owns a terminal
action calls :func:`release_caches` on the frame afterwards. ``bench.py``
needs neither — it clears the whole cache between queries — but the
streaming index (``FuzzyDedupIndex.ingest``) and any embedding service
must release, or they leak one relation per batch
(tests/test_caching.py pins the no-growth invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: attribute carrying the list of persisted ancestor DataFrames
_ATTR = "_mamba_cached_deps"


def attach_caches(
    df: DataFrame, *cached: DataFrame, inherit: tuple[DataFrame, ...] = ()
) -> DataFrame:
    """Record ``cached`` (persisted frames) as ``df``'s cache
    dependencies; ``inherit`` copies the dependencies already attached to
    upstream frames (for composites). Returns ``df``."""
    deps: list[DataFrame] = list(getattr(df, _ATTR, []))
    for src in inherit:
        deps.extend(getattr(src, _ATTR, []))
    deps.extend(cached)
    setattr(df, _ATTR, deps)
    return df


def cached_deps(df: DataFrame) -> tuple[DataFrame, ...]:
    """The persisted ancestors attached to ``df`` (possibly empty)."""
    return tuple(getattr(df, _ATTR, ()))


def release_caches(df: DataFrame, blocking: bool = False) -> int:
    """Unpersist every cache dependency attached to ``df`` (after the
    caller's terminal action). Returns the number released. Safe to call
    twice — the attachment list is cleared."""
    deps = cached_deps(df)
    for dep in deps:
        dep.unpersist(blocking)
    setattr(df, _ATTR, [])
    return len(deps)
