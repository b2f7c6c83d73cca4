"""Semantics tests for the temporal join operators (operators/asof.py,
plans/temporal_queries.py): inclusive backward match, tie-breaks,
null-before-first-match, and bucketized range-join exactness."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from content_analytics_etl_spark.operators.asof import (
    asof_join_backward,
    asof_join_forward,
)
from content_analytics_etl_spark.plans.temporal_queries import (
    RANGE_WINDOW_US,
    events_range_join,
)


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (100, 1, _ts("2024-01-01T00:05:00")),  # after v1 -> 10.0
            (101, 1, _ts("2024-01-01T00:10:00")),  # equal-ts view visible -> 20.0
            (102, 1, _ts("2024-01-01T00:00:30")),  # before any view -> NULL
            (103, 2, _ts("2024-01-01T09:00:00")),  # other key, tie on ts -> larger id wins
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:01:00"), 11, 10.0),
            (1, _ts("2024-01-01T00:10:00"), 12, 20.0),
            (2, _ts("2024-01-01T08:00:00"), 13, 30.0),
            (2, _ts("2024-01-01T08:00:00"), 14, 40.0),  # same ts, id 14 > 13 wins
        ],
        ["user_id", "ts", "event_id", "v"],
    )
    out = {
        r["event_id"]: r["v"]
        for r in asof_join_backward(
            left, right, on=["user_id"], ts_col="ts",
            right_value_cols=["v"], right_tiebreak="event_id",
        ).collect()
    }
    assert out == {100: 10.0, 101: 20.0, 102: None, 103: 40.0}


def test_asof_forward_semantics(spark):
    left = spark.createDataFrame(
        [
            (100, 1, _ts("2024-01-01T00:05:00")),  # before v2 -> 20.0
            (101, 1, _ts("2024-01-01T00:10:00")),  # equal-ts row visible -> 20.0
            (102, 1, _ts("2024-01-01T00:20:00")),  # after every row -> NULL
            (103, 2, _ts("2024-01-01T07:00:00")),  # tie on ts -> SMALLER id wins
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:01:00"), 11, 10.0),
            (1, _ts("2024-01-01T00:10:00"), 12, 20.0),
            (2, _ts("2024-01-01T08:00:00"), 13, 30.0),
            (2, _ts("2024-01-01T08:00:00"), 14, 40.0),  # same ts, id 13 < 14 wins
        ],
        ["user_id", "ts", "event_id", "v"],
    )
    out = {
        r["event_id"]: r["v"]
        for r in asof_join_forward(
            left, right, on=["user_id"], ts_col="ts",
            right_value_cols=["v"], right_tiebreak="event_id",
        ).collect()
    }
    assert out == {100: 20.0, 101: 20.0, 102: None, 103: 30.0}


def test_range_join_matches_naive(spark, sf_dir):
    """The bucketized plan must produce exactly the naive non-equi
    join's pairs (no duplicates, no misses across bucket edges)."""
    from content_analytics_etl_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.unix_micros("ts").alias("vus")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.unix_micros("ts").alias("cus")
    )
    naive = {
        (r["view_id"], r["click_id"])
        for r in v.join(c, "user_id")
        .filter((F.col("cus") - F.col("vus") > 0) & (F.col("cus") - F.col("vus") <= RANGE_WINDOW_US))
        .collect()
    }
    bucketed = [
        (r["view_id"], r["click_id"]) for r in events_range_join(spark, sf_dir).collect()
    ]
    assert len(bucketed) == len(set(bucketed))  # exactly-once generation
    assert set(bucketed) == naive


def test_asof_row_atomic_null_fields(spark):
    """A NULL in the matched right row must NOT be backfilled from an
    older row, and multiple value columns must come from the SAME right
    row (struct-packed as-of semantics)."""
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T00:30:00"))], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:10:00"), 11, 5.0, "old"),
            (1, _ts("2024-01-01T00:20:00"), 12, None, "new"),
        ],
        "user_id long, ts timestamp, rid long, v double, tag string",
    )
    row = asof_join_backward(
        left, right, on=["user_id"], ts_col="ts",
        right_value_cols=["v", "tag"], right_tiebreak="rid",
    ).collect()[0]
    assert row["tag"] == "new"
    assert row["v"] is None  # NOT 5.0 backfilled from the older row


def test_asof_forward_row_atomic_null_fields(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T00:00:00"))], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:10:00"), 11, None, "first"),
            (1, _ts("2024-01-01T00:20:00"), 12, 7.0, "later"),
        ],
        "user_id long, ts timestamp, rid long, v double, tag string",
    )
    row = asof_join_forward(
        left, right, on=["user_id"], ts_col="ts",
        right_value_cols=["v", "tag"], right_tiebreak="rid",
    ).collect()[0]
    assert row["tag"] == "first"
    assert row["v"] is None  # NOT 7.0 pulled forward from the later row


def test_asof_nearest_picks_closer_and_backward_wins_ties(spark):
    from content_analytics_etl_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01T00:10:00")),  # back 10min, fwd 5min → fwd
            (2, 2, _ts("2024-01-01T00:10:00")),  # back 5min = fwd 5min → back
            (3, 3, _ts("2024-01-01T00:10:00")),  # only backward exists
            (4, 4, _ts("2024-01-01T00:10:00")),  # no right rows at all
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), 11, 1.0),
            (1, _ts("2024-01-01T00:15:00"), 12, 2.0),
            (2, _ts("2024-01-01T00:05:00"), 21, 3.0),
            (2, _ts("2024-01-01T00:15:00"), 22, 4.0),
            (3, _ts("2024-01-01T00:00:00"), 31, 5.0),
        ],
        "user_id long, ts timestamp, rid long, v double",
    )
    rows = {
        r["event_id"]: r
        for r in asof_join_nearest(
            left, right, on=["user_id"], ts_col="ts",
            right_value_cols=["v"], right_tiebreak="rid",
            matched_ts_col="mts",
        ).collect()
    }
    assert rows[1]["v"] == 2.0  # forward is closer
    assert rows[2]["v"] == 3.0  # tie → backward wins
    assert rows[3]["v"] == 5.0  # only backward
    assert rows[4]["v"] is None and rows[4]["mts"] is None


def test_asof_nearest_equal_ts_tiebreaks_per_direction(spark):
    from content_analytics_etl_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T00:10:00"))], ["event_id", "user_id", "ts"]
    )
    # two right rows tied at the SAME backward ts → largest rid wins
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:05:00"), 11, 1.0),
            (1, _ts("2024-01-01T00:05:00"), 12, 2.0),
        ],
        "user_id long, ts timestamp, rid long, v double",
    )
    row = asof_join_nearest(
        left, right, on=["user_id"], ts_col="ts",
        right_value_cols=["v"], right_tiebreak="rid",
    ).collect()[0]
    assert row["v"] == 2.0
    # two right rows tied at the SAME forward ts → smallest rid wins
    right_f = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:15:00"), 11, 1.0),
            (1, _ts("2024-01-01T00:15:00"), 12, 2.0),
        ],
        "user_id long, ts timestamp, rid long, v double",
    )
    row = asof_join_nearest(
        left, right_f, on=["user_id"], ts_col="ts",
        right_value_cols=["v"], right_tiebreak="rid",
    ).collect()[0]
    assert row["v"] == 1.0
