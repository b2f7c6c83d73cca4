"""Streaming deduplication — the streaming twin of the batch
``dedup_exact`` family (BASELINE "deduplication" extension; absent from
the reference, which is batch-only — SURVEY.md §2.8).

Two operators, matching Spark's two state contracts:

- :func:`dedup_stream_exact` — ``dropDuplicates`` on a key set: keeps
  the first arrival of each key for the stream's lifetime. State is one
  entry per distinct key, forever — right for bounded key spaces
  (a backfill of a fixed corpus, an id-keyed CDC stream).
- :func:`dedup_stream_within_watermark` —
  ``dropDuplicatesWithinWatermark``: duplicates are only suppressed
  while their event time is above the watermark, and state for older
  keys is evicted. This is the 100 TB continuous-ingest path: state is
  bounded by (arrival rate × watermark horizon), not by lifetime
  distinct keys.

Both emit append-mode rows, so they compose with any downstream sink
(partitioned parquet via ``Trigger.AvailableNow`` in the ingest shape of
``streaming/ingest.py``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

__all__ = ["dedup_stream_exact", "dedup_stream_within_watermark"]


def dedup_stream_exact(events: DataFrame, keys: Sequence[str]) -> DataFrame:
    """First-arrival-wins exact dedup over the stream lifetime.
    Unbounded state (one entry per distinct key) — use only when the
    key space is bounded; otherwise use
    :func:`dedup_stream_within_watermark`."""
    return events.dropDuplicates(list(keys))


def dedup_stream_within_watermark(
    events: DataFrame,
    keys: Sequence[str],
    *,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermark-bounded dedup: suppresses duplicates whose event time
    falls within the watermark horizon, then evicts their state. The
    correct operator for continuous ingest where duplicates arrive
    close together (retries, at-least-once sources) and lifetime-global
    dedup state would grow without bound."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
