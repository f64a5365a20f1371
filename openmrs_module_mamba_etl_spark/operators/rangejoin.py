"""Range (interval) join — point-in-interval matching at scale.

Spark executes a raw ``t BETWEEN start AND end`` join condition as a
broadcast-nested-loop or a per-key cartesian + filter: O(|points| ×
|intervals|) comparisons per key. The scalable shape is BUCKETIZATION —
quantize time into fixed-width buckets, replicate each interval into the
buckets it overlaps, give each point its single bucket, and the range
join becomes a plain (key, bucket) equi-join (hash shuffle, AQE-planned)
followed by the exact range predicate on the survivors.

Each (point, interval) true pair meets in EXACTLY one bucket — the
point's — so no post-join dedup is needed. Replication factor is
⌈interval_len / bucket_width⌉ + 1; pick the width near the typical
interval length (a knob, not a correctness parameter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_key: str,
    interval_key: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Half-open match: ``start <= ts < end``, keys equal.

    ``ts_col`` / ``start_col`` / ``end_col`` are int64 in one shared unit
    (e.g. µs since epoch); ``bucket_width`` is in that unit. Output =
    all columns of both inputs for each matching pair.
    """
    p = points.withColumn(
        "_b", F.floor(F.col(ts_col) / F.lit(bucket_width)).cast("long")
    )
    i = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_width)).cast("long"),
                # end is exclusive: the last overlapped bucket holds end−1
                F.floor((F.col(end_col) - 1) / F.lit(bucket_width)).cast(
                    "long"
                ),
            )
        ),
    )
    return (
        p.join(
            i,
            [
                p["_b"] == i["_b"],
                F.col(point_key) == F.col(interval_key),
            ],
        )
        .where(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop("_b")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
) -> DataFrame:
    """Interval-overlap join: emit (l, r) when keys match and the
    half-open intervals overlap (``l_start < r_end AND r_start < l_end``).

    Both sides replicate into the buckets they span, meet on a
    (key, bucket) equi-join, and the exact overlap predicate filters the
    survivors. A true pair meets in every bucket both spans cover, so the
    dedup is positional: keep the pair ONLY in the first bucket they
    share, ``max(bucket(l_start), bucket(r_start))`` — one comparison,
    no distinct/shuffle. Replication is ⌈len/width⌉+1 per side; cost is
    linear in total interval length over width, never |L|×|R| per key.
    """

    def _spanned(df: DataFrame, start: str, end: str) -> DataFrame:
        lo = F.floor(F.col(start) / F.lit(bucket_width)).cast("long")
        hi = F.floor((F.col(end) - 1) / F.lit(bucket_width)).cast("long")
        # Degenerate (empty, end <= start) intervals: clamp to the start
        # bucket. An unclamped descending F.sequence would replicate the
        # row into buckets it never touches; the clamped single bucket is
        # exactly where the theta predicate can still match it (it behaves
        # as the point `start`, e.g. [s, s) vs a left strictly containing s).
        return df.withColumn(
            "_b", F.explode(F.sequence(lo, F.greatest(lo, hi)))
        )

    l = _spanned(left, left_start, left_end)
    r = _spanned(right, right_start, right_end)
    first_common = F.greatest(
        F.floor(F.col(left_start) / F.lit(bucket_width)).cast("long"),
        F.floor(F.col(right_start) / F.lit(bucket_width)).cast("long"),
    )
    return (
        l.join(
            r,
            [l["_b"] == r["_b"], F.col(left_key) == F.col(right_key)],
        )
        .where(
            (F.col(left_start) < F.col(right_end))
            & (F.col(right_start) < F.col(left_end))
            & (l["_b"] == first_common)
        )
        .drop("_b")
    )
