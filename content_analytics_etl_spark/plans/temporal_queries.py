"""Temporal join queries over ``events`` — as-of and range joins, the
§7 extension operators the reference's join surface (one inner
equi-join, SURVEY.md §2.4) lacks entirely.

Both are oracle-checked via window/non-equi ANSI SQL (NOT DuckDB's
ASOF JOIN syntax, which is nondeterministic under timestamp ties — see
operators/asof.py for the determinism contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join_backward
from ._util import t

RANGE_WINDOW_US = 600_000_000  # 10 minutes, microseconds


def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the value of the same user's most recent view at
    or before the click (NULL before any view). Backward as-of join as
    union+window — one shuffle on user_id (operators/asof.py)."""
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", F.col("value").alias("last_view_value")
    )
    return asof_join_backward(
        clicks,
        views,
        on=["user_id"],
        ts_col="ts",
        right_value_cols=["last_view_value"],
        right_tiebreak="event_id",
    )


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→click conversion pairs: clicks within 10 minutes AFTER a
    view by the same user, with the exact microsecond delta.

    Range joins explode at scale if expressed as a raw non-equi join
    (every user's views × clicks). This plan bucketizes time into
    range-width buckets and equi-joins on (user, bucket) with the view
    side exploded to {bucket, bucket+1} — each candidate pair is
    generated exactly once, the shuffle is an ordinary equi-join
    shuffle, and the exact range predicate runs only on same-bucket
    candidates. This is the standard interval-join physical plan (what
    Spark's Structured Streaming interval joins do internally)."""
    e = t(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.unix_micros("ts").alias("view_us"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("click_us"),
    )
    w = F.lit(RANGE_WINDOW_US).cast("long")
    vb = v.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.expr(f"view_us DIV {RANGE_WINDOW_US}"),
                F.expr(f"view_us DIV {RANGE_WINDOW_US} + 1"),
            )
        ),
    )
    cb = c.withColumn("bucket", F.expr(f"click_us DIV {RANGE_WINDOW_US}"))
    delta = F.col("click_us") - F.col("view_us")
    return (
        vb.join(cb, ["user_id", "bucket"])
        .filter((delta > 0) & (delta <= w))
        .select("view_id", "click_id", delta.alias("delta_us"))
    )


QUERIES = {
    "events_asof_join": events_asof_join,
    "events_range_join": events_range_join,
}

ORACLES = {
    "events_asof_join": """
        WITH u AS (
          SELECT user_id, ts, event_id AS tb, 0 AS side,
                 value AS view_value, NULL::BIGINT AS event_id_out
          FROM events WHERE event_type = 'view'
          UNION ALL
          SELECT user_id, ts, NULL::BIGINT AS tb, 1 AS side,
                 NULL::DOUBLE AS view_value, event_id AS event_id_out
          FROM events WHERE event_type = 'click'
        ),
        f AS (
          SELECT *, last_value(view_value IGNORE NULLS) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, side, tb ASC NULLS LAST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS last_view_value
          FROM u
        )
        SELECT event_id_out AS event_id, user_id, ts, last_view_value
        FROM f WHERE side = 1
    """,
    "events_range_join": f"""
        SELECT v.event_id AS view_id, c.event_id AS click_id,
               epoch_us(c.ts) - epoch_us(v.ts) AS delta_us
        FROM events v
        JOIN events c
          ON v.user_id = c.user_id
         AND v.event_type = 'view' AND c.event_type = 'click'
         AND epoch_us(c.ts) - epoch_us(v.ts) > 0
         AND epoch_us(c.ts) - epoch_us(v.ts) <= {RANGE_WINDOW_US}
    """,
}
