"""Z-order (Morton-curve) clustered writes for multi-dimensional skipping.

A parquet scan prunes row groups by min/max statistics. Sorting by one
column gives perfect pruning on that column and none on any other;
interleaving the bits of several columns' quantile-ranks gives GOOD
pruning on every participating column at once — each output file covers a
small hyper-rectangle of the key space. This is the standard lakehouse
`OPTIMIZE ZORDER BY` layout, built from primitives Spark already has:

- cut points from ``approxQuantile`` (one sketch pass — NO global sort or
  window; the driver holds only ``2^bits − 1`` doubles per column);
- bucket assignment + bit interleave as pure codegen expressions;
- ``repartitionByRange`` on the Morton key (range exchange via sampled
  boundaries) so each output file owns a contiguous curve segment.

The whole operator is one pass + one range shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bucket_of(col: Column, cuts: list[float]) -> Column:
    """Quantile-bucket index of ``col`` given sorted cut points: the count
    of cut points ≤ value (a fold over a tiny literal array — codegen)."""
    arr = F.array(*[F.lit(float(c)) for c in cuts])
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, c: acc + F.when(col.cast("double") >= c, 1).otherwise(0),
    )


def morton_key(buckets: list[Column], bits: int) -> Column:
    """Bit-interleave k bucket ids (each < 2^bits) into one Z-curve key."""
    key = F.lit(0).cast("long")
    for i in range(bits):  # bit position within each bucket id
        for d, b in enumerate(buckets):  # dimension
            bit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, i * len(buckets) + d).cast("long")
            )
    return key


def zorder_frame(df: DataFrame, cols: list[str], bits: int = 4) -> DataFrame:
    """Attach a ``_zkey`` Morton key over ``cols`` quantile-ranks.

    ``relativeError=0.01`` keeps the quantile sketch one cheap pass; layout
    quality degrades gracefully with sketch error (a mis-bucketed row costs
    a slightly wider file range, never correctness).
    """
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.approxQuantile(cols, probs, 0.01)
    buckets = [_bucket_of(F.col(c), cut) for c, cut in zip(cols, cuts)]
    return df.withColumn("_zkey", morton_key(buckets, bits))


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 8,
    bits: int = 4,
) -> None:
    """Write ``df`` z-ordered by ``cols`` into ~``n_files`` curve segments."""
    (
        zorder_frame(df, cols, bits)
        .repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
