"""events_cusum_drift: the prefix-sum/prefix-min identity must equal
the literal one-sided CUSUM recursion S_t = max(0, S_{t-1} + (x_t - μ))
computed row by row in Python from the same daily counts."""

from __future__ import annotations

from fractions import Fraction

import pyspark.sql.functions as F
import pytest

from content_analytics_etl_spark.session import get_spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-cusum")


def test_identity_matches_literal_recursion(spark):
    from content_analytics_etl_spark.plans.analytics_queries import (
        CUSUM_H_MULT,
        events_cusum_drift,
    )

    daily = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    series: dict[str, list[tuple]] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["x"]))
    expect = {}
    for et, rows in series.items():
        rows.sort()
        xs = [x for _, x in rows]
        mu = Fraction(sum(xs), len(xs))  # exact rational mean
        s = Fraction(0)
        for (day, x) in rows:
            s = max(Fraction(0), s + (x - mu))
            expect[(et, day)] = (s, s > CUSUM_H_MULT * mu)

    got = events_cusum_drift(spark, SF).collect()
    assert len(got) == len(expect)
    for r in got:
        s_exact, drift = expect[(r["event_type"], r["day"])]
        assert r["cusum"] == pytest.approx(float(s_exact), abs=1e-9)
        assert r["drift"] == drift


def test_drift_fires_on_shifted_series(spark):
    """A synthetic level shift must raise the alarm — proves the flag
    is reachable (the stationary corpus never fires it). Mirrors the
    query's scaled-integer pipeline on a frame with a known change
    point at t=10: 20 quiet days at 10/day then 10 loud days at
    100/day."""
    from content_analytics_etl_spark.plans.analytics_queries import (
        CUSUM_H_MULT,
    )
    from pyspark.sql import Window as W

    import datetime as dt

    rows = [
        ("t", dt.date(2024, 1, 1) + dt.timedelta(days=i), 10 if i < 20 else 100)
        for i in range(30)
    ]
    daily = spark.createDataFrame(rows, "event_type string, day date, n_events long")
    per = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_events").alias("total")
    )
    j = daily.join(F.broadcast(per), "event_type")
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = j.withColumn(
        "cp", F.sum(F.col("n_events") * F.col("n") - F.col("total")).over(w)
    )
    s = c.withColumn(
        "sp",
        F.col("cp") - F.least(F.lit(0).cast("bigint"), F.min("cp").over(w)),
    )
    out = s.select(
        "day", (F.col("sp") > CUSUM_H_MULT * F.col("total")).alias("drift")
    ).collect()
    fired = sorted(r["day"] for r in out if r["drift"])
    assert fired and fired[0] >= dt.date(2024, 1, 21)
