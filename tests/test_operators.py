"""Unit tests for the reference operator surface (SURVEY.md §2),
including every quirk the fidelity set must preserve (FIXTURES.md §1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from content_analytics_etl_spark.operators.olap import argmax_label, bucketize, taste_label
from content_analytics_etl_spark.operators.profile import count_devices, pivot_profile
from content_analytics_etl_spark.operators.recode import (
    VIEWING_CATEGORY_MAP,
    recode_category,
)


def test_recode_first_match_and_default(spark):
    df = spark.createDataFrame(
        [("KPLUS",), ("KPlus",), ("kplus",), ("VOD",), ("JUNK",), (None,)],
        ["AppName"],
    )
    out = dict(
        df.select(
            "AppName", recode_category("AppName", VIEWING_CATEGORY_MAP).alias("t")
        ).collect()
    )
    assert out["KPLUS"] == "TVDuration"
    assert out["KPlus"] == "TVDuration"  # case-variant listed explicitly
    assert out["kplus"] == "Error"  # isin is case-sensitive
    assert out["VOD"] == "MovieDuration"
    assert out["JUNK"] == "Error"
    assert out[None] == "Error"  # NULL falls through to otherwise


def test_count_devices_rowcount_vs_distinct(spark):
    # FIXTURES: 5 log rows over 3 distinct Macs → fidelity 5, corrected 3
    rows = [("C1", "M1"), ("C1", "M1"), ("C1", "M2"), ("C1", "M2"), ("C1", "M3")]
    df = spark.createDataFrame(rows, ["Contract", "Mac"])
    fid = count_devices(df).collect()[0]
    fix = count_devices(df, distinct=True).collect()[0]
    assert fid["TotalDevices"] == 5
    assert fix["TotalDevices"] == 3


def test_pivot_explicit_values_stable_schema(spark):
    # single-category input: explicit value list still yields all columns
    df = spark.createDataFrame(
        [("C1", "SportDuration", 10), ("C2", "SportDuration", 20)],
        ["Contract", "Type", "TotalDuration"],
    )
    cats = ["ChildDuration", "MovieDuration", "SportDuration"]
    wide = pivot_profile(df, "Contract", "Type", "TotalDuration", cats, fill=0)
    assert set(wide.columns) == {"Contract", *cats}
    r = {row["Contract"]: row for row in wide.collect()}
    assert r["C1"]["SportDuration"] == 10
    assert r["C1"]["ChildDuration"] == 0  # absent category filled

    nulls = pivot_profile(df, "Contract", "Type", "TotalDuration", cats, fill=None)
    assert {row["ChildDuration"] for row in nulls.collect()} == {None}


def test_argmax_tie_order(spark):
    # FIXTURES: tie-break = first WHEN in order (Child > Movie > ...)
    df = spark.createDataFrame([(5, 5, 1)], ["ChildDuration", "MovieDuration", "X"])
    lbl = argmax_label({"ChildDuration": "Child", "MovieDuration": "Movie"})
    assert df.select(lbl.alias("l")).collect()[0]["l"] == "Child"
    df2 = spark.createDataFrame([(1, 5, 1)], ["ChildDuration", "MovieDuration", "X"])
    assert df2.select(lbl.alias("l")).collect()[0]["l"] == "Movie"


def test_taste_skips_zero_and_empty_string(spark):
    cols = {"A": "a", "B": "b", "C": "c"}
    df = spark.createDataFrame([(1, 0, 2), (0, 0, 0)], ["A", "B", "C"])
    out = [r["t"] for r in df.select(taste_label(cols).alias("t")).collect()]
    assert out == ["a-c", ""]  # all-zero profile → empty string (F5 quirk)


def test_bucketize_boundaries(spark):
    df = spark.createDataFrame([(0.0,), (9.99,), (10.0,), (19.99,), (20.0,)], ["v"])
    b = bucketize("v", [10, 20], ["Low", "Medium", "High"])
    out = [r["b"] for r in df.select(F.col("v"), b.alias("b")).collect()]
    assert out == ["Low", "Low", "Medium", "Medium", "High"]
