"""Skew mitigation: salted aggregation and replicated (salted) joins.

AQE's skew-join splitting (on in session defaults) handles most runtime
skew; these operators cover the cases AQE cannot re-plan:

- a *hash aggregation* where one key dominates (AQE splits join partitions,
  not aggregation groups) → :func:`salted_agg` two-phase aggregation;
- a shuffle join against a *known* heavy-hitter key distribution where the
  small side fits in memory per heavy key → :func:`replicate_join`.

Salts are deterministic (xxhash64 of the row's own columns), so results are
reproducible and no ``rand()`` breaks retry idempotency at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Algebraic aggregates that two-phase cleanly: (partial fn, merge fn).
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation over a salted key.

    ``aggs`` maps output column → (input column, fn) with fn in
    sum/count/min/max. Phase 1 aggregates by (keys..., salt) — the hot key
    spreads over ``n_salts`` reducers — phase 2 merges per key. The salt is
    ``xxhash64(salt_cols or all columns) % n_salts``: deterministic, no RNG.
    """
    for _, (col, fn) in aggs.items():
        if fn not in _ALGEBRAIC:
            raise ValueError(f"non-algebraic aggregate {fn!r}; use sum/count/min/max")

    basis = salt_cols or df.columns
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in basis]), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _ALGEBRAIC[fn][0](F.col(col)).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[fn][1](F.col(out)).alias(out)
            for out, (_, fn) in aggs.items()
        ]
    )


def replicate_join(
    skewed: DataFrame,
    other: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted equi-join: spread a skewed left side over ``n_salts`` buckets,
    replicate the right side once per bucket, join on (keys..., salt).

    Right-side rows multiply by ``n_salts`` — use when the right side is
    dimension-sized but too large (or too hot) for a plain broadcast. The
    left salt is deterministic per row (hash of all its columns).
    """
    salted_l = skewed.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts)),
    )
    replicated_r = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    out = salted_l.join(replicated_r, [*keys, "_salt"], how)
    return out.drop("_salt")
