"""Structured Streaming windowed aggregations (SURVEY.md §2.8 — absent
in the reference; §7 Phase 3 extension).

The transformations are the SAME expressions as the batch queries in
``plans/events_queries.py`` — one definition of window semantics, two
execution modes. Watermarks bound state: late rows beyond the watermark
are dropped instead of growing state forever (the 100 TB streaming
requirement). Tests drive these with a file source + ``availableNow``
trigger and assert equality with the batch results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import STAR_SCHEMAS
from ..sources.readers import parquet_ts_unit

__all__ = ["stream_events", "tumbling_counts", "sliding_counts"]


def stream_events(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream of the events table (directory of parquet
    files; each new file is a micro-batch input). ts unit handling
    mirrors the batch reader (sources/readers.py): the physical unit is
    sniffed from an existing file footer — timestamp[ns] sources scan as
    epoch-nanos long (nanosAsLong) and convert to µs; timestamp[us]
    sources read directly. Files arriving later must match the unit of
    the files present at stream definition (one writer per directory).
    An empty/not-yet-populated directory (the normal streaming startup
    case: the stream is defined before the first producer file lands)
    defaults to timestamp[us] — Spark's native parquet unit — instead
    of failing the stream definition."""
    try:
        unit = parquet_ts_unit(events_dir)
    except (FileNotFoundError, OSError):
        unit = "us"
    if unit == "ns":
        schema = T.StructType(
            [
                T.StructField(
                    f.name, T.LongType() if f.name == "ts" else f.dataType, True
                )
                for f in STAR_SCHEMAS["events"].fields
            ]
        )
        raw = spark.readStream.schema(schema).parquet(events_dir)
        return raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return spark.readStream.schema(STAR_SCHEMAS["events"]).parquet(events_dir)


def tumbling_counts(
    events: DataFrame, *, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window per event type, watermarked."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding event-time windows, watermarked."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )
