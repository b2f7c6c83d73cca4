"""Session windows in streaming mode (F.session_window): gap-merged
per-user sessions, the streaming twin of the batch lag+cumsum
sessionization in ``plans/events_queries.py`` (same 30-min gap ⇒ same
sessions on the same data; the batch query's DuckDB oracle therefore
also validates this operator's semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["session_aggregate"]


def session_aggregate(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user gap-based sessions: start/end/n_events/total_value."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "user_id", "session_start", "session_end", "n_events", "total_value"
        )
    )
