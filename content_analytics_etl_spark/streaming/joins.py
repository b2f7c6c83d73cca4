"""Stream-stream interval join — the streaming twin of the batch
``events_range_join`` (plans/temporal_queries.py).

Spark executes this with exactly the bucketized-candidate shape the
batch plan spells out manually, plus state: both sides are watermarked,
the time-bound join condition lets the state store evict a buffered view
once ``view.ts + window + watermark`` passes — bounded state, the
requirement for an unbounded 100 TB/day stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["view_click_conversions"]


def view_click_conversions(
    events: DataFrame,
    *,
    window_s: int = 600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Pairs (view_id, click_id, delta_us): clicks within ``window_s``
    after a same-user view. ``events`` is a streaming DataFrame
    (streaming/windows.py: stream_events)."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    cond = (
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {window_s} SECONDS"))
    )
    return views.join(clicks, cond).select(
        "view_id",
        "click_id",
        (F.unix_micros("c_ts") - F.unix_micros("v_ts")).alias("delta_us"),
    )
