"""Watermarked windowed aggregation — the built-in late-data operator.

Where :mod:`.sessionize` demonstrates the CUSTOM stateful seam
(`applyInPandasWithState`), this module is the idiomatic built-in path:
``withWatermark`` + ``F.window`` tumbling windows + hash aggregate. The
engine keeps per-window partial aggregates in the state store, admits
late events until the watermark passes ``window.end``, then finalizes and
emits (append mode) — exactly the semantics a 100 TB event pipeline needs
for hourly/daily rollups with bounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from openmrs_module_mamba_etl_spark.operators.sessionize import ns_to_ts


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 day",
    watermark_delay: str = "1 hour",
    key_col: str | None = None,
) -> DataFrame:
    """Tumbling-window counts/sums over an int64-ns event-time stream.

    Append-mode emission: a window row appears exactly once, when the
    watermark passes its end — deterministic for an ``availableNow`` drain
    (final watermark = max event time − delay). State is one partial
    aggregate per (window, key): bounded by window count, not event count.
    """
    keyed = stream.withColumn("_event_ts", ns_to_ts(ts_col)).withWatermark(
        "_event_ts", watermark_delay
    )
    group = [F.window("_event_ts", window).alias("w")]
    if key_col:
        group.append(F.col(key_col))
    return (
        keyed.groupBy(*group)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *([key_col] if key_col else []),
            "n_events",
            "sum_value",
        )
    )
