"""Edge semantics for the SCD2 upsert (operators/scd.py) and the
scan-time quality observer (operators/quality.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from content_analytics_etl_spark.operators.quality import observe_quality
from content_analytics_etl_spark.operators.scd import scd2_apply

T0 = datetime(2020, 1, 1)
T1 = datetime(2021, 6, 1)
T2 = datetime(2022, 3, 1)


def _dim(spark):
    # key 1: current v2 + closed v1; key 2: current only; key 3: current only
    return spark.createDataFrame(
        [
            (1, "a", T0, T1, False),
            (1, "b", T1, None, True),
            (2, "x", T0, None, True),
            (3, "y", T0, None, True),
        ],
        ["k", "attr", "valid_from", "valid_to", "is_current"],
    )


def test_scd2_upsert_branches(spark):
    changes = spark.createDataFrame(
        [
            (1, "c", T2),  # differs -> close v2, open v3
            (2, "x", T2),  # identical -> no-op
            (9, "new", T2),  # brand-new key -> insert
        ],
        ["k", "attr", "change_ts"],
    )
    out = scd2_apply(_dim(spark), changes, key="k", tracked=["attr"])
    rows = {
        (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out.collect()
    }
    assert rows == {
        (1, "a", T0, T1, False),  # history untouched
        (1, "b", T1, T2, False),  # closed at change_ts
        (1, "c", T2, None, True),  # new current version
        (2, "x", T0, None, True),  # no-op change keeps version
        (3, "y", T0, None, True),  # unmatched key untouched
        (9, "new", T2, None, True),  # brand-new key inserted
    }


def test_scd2_null_attr_comparison(spark):
    """eqNullSafe: NULL→NULL is a no-op, NULL→value is a real change."""
    dim = spark.createDataFrame(
        [(1, None, T0, None, True), (2, None, T0, None, True)],
        "k int, attr string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    changes = spark.createDataFrame(
        [(1, None, T2), (2, "v", T2)], "k int, attr string, change_ts timestamp"
    )
    out = scd2_apply(dim, changes, key="k", tracked=["attr"])
    by_key = {}
    for r in out.collect():
        by_key.setdefault(r["k"], []).append(r)
    assert len(by_key[1]) == 1 and by_key[1][0]["is_current"]  # no-op
    assert len(by_key[2]) == 2  # closed + opened


def test_observe_quality_metrics(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (None, "d")], ["id", "s"]
    )
    inst, obs = observe_quality(
        df, null_cols=["id", "s"], extra=[F.sum(F.col("id")).alias("sum_id")]
    )
    assert inst.count() == 4  # the action that materializes the metrics
    got = obs.get
    assert got["n_rows"] == 4
    assert got["n_null_id"] == 1
    assert got["n_null_s"] == 2
    assert got["sum_id"] == 6


def test_scd2_duplicate_change_keys_collapse_to_latest(spark):
    """Several change rows for one key must produce exactly one closed
    and one opened version (latest change wins), not a fan-out."""
    from datetime import datetime

    dim = spark.createDataFrame(
        [(1, "a", datetime(2024, 1, 1), None, True)],
        "k long, attr string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    changes = spark.createDataFrame(
        [
            (1, "b", datetime(2024, 2, 1)),
            (1, "c", datetime(2024, 3, 1)),  # later -> wins
        ],
        "k long, attr string, change_ts timestamp",
    )
    out = scd2_apply(dim, changes, key="k", tracked=["attr"]).collect()
    assert len(out) == 2  # one closed + one opened, no fan-out
    closed = [r for r in out if not r["is_current"]]
    opened = [r for r in out if r["is_current"]]
    assert len(closed) == 1 and closed[0]["attr"] == "a"
    assert closed[0]["valid_to"] == datetime(2024, 3, 1)
    assert len(opened) == 1 and opened[0]["attr"] == "c"


def test_scd2_null_valid_from_preserved(spark):
    """A current row with NULL valid_from is legitimate data and must
    survive an upsert that does not touch its key."""
    dim = spark.createDataFrame(
        [(1, "a", None, None, True)],
        "k long, attr string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    changes = spark.createDataFrame(
        [], "k long, attr string, change_ts timestamp"
    )
    out = scd2_apply(dim, changes, key="k", tracked=["attr"]).collect()
    assert len(out) == 1
    assert out[0]["is_current"] and out[0]["attr"] == "a"
