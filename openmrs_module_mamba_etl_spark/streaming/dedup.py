"""Streaming deduplication — exactly-once document admission.

A training-data ingest stream must admit each distinct document ONCE across
every micro-batch ever processed, not once per batch. Spark's streaming
``dropDuplicates`` does precisely this: the state store keeps the seen-key
set, a key's FIRST arrival is emitted (append mode) and every later arrival
in any batch is dropped.

Two state regimes:

- :func:`streaming_dedup` — unbounded state (the full seen-key set). Right
  when the key is a content hash and the corpus's distinct-hash count fits
  state storage (hashes are 32 bytes — 1B docs ≈ tens of GB across the
  cluster, RocksDB state store territory, fine).
- :func:`streaming_dedup_within_watermark` — bounded state via
  ``dropDuplicatesWithinWatermark``: only duplicates arriving within the
  watermark delay of each other are collapsed, and state older than the
  watermark is evicted. Right for at-least-once upstreams (e.g. Kafka
  redelivery), where duplicates cluster in time and the seen-set must not
  grow with corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from openmrs_module_mamba_etl_spark.operators.sessionize import ns_to_ts


def streaming_dedup(
    stream: DataFrame, key: Column, key_name: str = "content_hash"
) -> DataFrame:
    """Exactly-once-per-key emission over the whole stream lifetime.

    Projects to the dedup key BEFORE ``dropDuplicates`` so (a) the state
    store and shuffle carry only the key column, never document payloads,
    and (b) the emission set is deterministic — the set of distinct keys —
    regardless of arrival order or micro-batch boundaries (which row of a
    dup group arrives first is racy; the key is the same either way).
    """
    return stream.select(key.alias(key_name)).dropDuplicates([key_name])


def streaming_dedup_within_watermark(
    stream: DataFrame,
    key: Column,
    ts_col: str = "ts",
    delay: str = "1 hour",
    key_name: str = "content_hash",
) -> DataFrame:
    """Bounded-state dedup: collapse duplicates within ``delay`` of each
    other; state beyond the watermark is evicted, so state size tracks the
    arrival rate × delay, not corpus size. Emission includes the event
    timestamp of the first-seen row (needed downstream for window ops)."""
    keyed = stream.withColumn("_event_ts", ns_to_ts(ts_col)).withWatermark(
        "_event_ts", delay
    )
    return keyed.select(
        key.alias(key_name), "_event_ts"
    ).dropDuplicatesWithinWatermark([key_name])
