"""Distributed logistic-regression training as DataFrame aggregates.

The quality-classifier TRAINING loop (the model ``classifier_score``
serves at inference time): full-batch gradient descent where every
iteration is ONE corpus pass — the per-doc logit is a codegen fold over
the current weight literals, the gradient is a map-side-combinable
(bucket, err·x) hash aggregate, and only the #buckets-sized gradient row
set ever reaches the driver. This is exactly how large-scale linear-model
training runs on Spark (and how MLlib's LBFGS/OWL-QN aggregates its
gradients); weights stay driver-side because the model is broadcast-sized
by construction.

Determinism contract: weights are rounded to ``round_w`` decimals at
every iteration boundary, which resets cross-engine partial-aggregation
float drift to zero — so a SQL oracle can replay the WHOLE training
trajectory exactly (see the ``train_logreg`` query), the same unrolled
replay pattern text_bpe_merges uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bucket_expr(tok, n_buckets: int):
    """Portable md5 bucket of a token (same contract as classifier_score /
    the sampling family): first 8 md5 hex chars → bigint % n_buckets."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
        % n_buckets
    ).cast("int")


def train_logreg_hashed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col,
    n_buckets: int = 16,
    iters: int = 3,
    lr: float = 1.0,
    round_w: int = 10,
) -> list[float]:
    """→ ``[w_0 .. w_{n_buckets-1}, bias]`` after ``iters`` full-batch
    gradient steps from zero init.

    Features are the normalized hashed bag of tokens (each token adds
    1/n_tokens to its md5 bucket); ``label_col`` is a 0/1 Column. Per
    iteration: logit = Σ w[bucket(t)]/n + bias (one fold per row, weight
    vector embedded as a literal array), err = σ(logit) − y, gradient =
    Σ err·x per bucket ÷ N (map-side combinable), bias gradient = avg
    err. Weights round to ``round_w`` decimals each step — the
    determinism contract that lets the oracle replay training exactly.
    """
    from openmrs_module_mamba_etl_spark.functions.similarity import tokens

    toks = tokens(F.col(text_col))
    base = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            toks.alias("tk"),
            label_col.cast("double").alias("y"),
        )
        .where(F.size("tk") > 0)
        .persist()
    )
    n_docs = base.count()

    w = [0.0] * n_buckets
    bias = 0.0
    for _ in range(iters):
        warr = F.array(*[F.lit(float(x)) for x in w])
        logit = (
            F.aggregate(
                F.transform(
                    F.col("tk"),
                    lambda t: F.element_at(
                        warr, _bucket_expr(t, n_buckets) + 1
                    ),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.size("tk")
            + F.lit(float(bias))
        )
        err = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)) - F.col("y")
        scored = base.select(F.col("tk"), err.alias("err"))
        grad_rows = (
            scored.select(
                F.explode(
                    F.transform(
                        "tk",
                        lambda t: _bucket_expr(t, n_buckets),
                    )
                ).alias("bucket"),
                (F.col("err") / F.size("tk")).alias("ex"),
            )
            .groupBy("bucket")
            .agg(F.sum("ex").alias("g"))
            .collect()
        )
        bias_row = scored.agg(F.avg("err").alias("g")).first()
        # empty corpus: no gradient signal — AVG is NULL, weights stay 0
        bg = float(bias_row["g"]) if bias_row["g"] is not None else 0.0
        grad = {int(r["bucket"]): float(r["g"]) / n_docs for r in grad_rows}
        w = [
            round(w[b] - lr * grad.get(b, 0.0), round_w)
            for b in range(n_buckets)
        ]
        bias = round(bias - lr * bg, round_w)
    base.unpersist()
    return w + [bias]
