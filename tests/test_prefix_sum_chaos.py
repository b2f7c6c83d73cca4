"""Recomputation-determinism proof for the distributed prefix sum
(VERDICT r6 #8).

The operator's correctness claim is that its persist() is a pure
performance choice: pids are derived from ROW VALUES, so if an executor
is lost and a partition is recomputed between the offsets pass and the
window pass (or during either), every row lands in the same pid and the
result is bit-identical. The predecessor design tagged rows with
``spark_partition_id()`` after ``repartitionByRange`` — there a
recompute could silently re-sample range boundaries and shift pids
between the two passes (ADVICE r5).

Chaos harness: disable persist/unpersist entirely (every action
re-derives the input from scratch — strictly MORE recomputation than
any single executor loss) over an input whose physical partitioning is
scrambled, and require the result to equal both the persisted run and a
single-threaded Python fold.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from content_analytics_etl_spark.operators.prefix_sum import (
    distributed_prefix_sum,
)
from content_analytics_etl_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-prefix-sum-chaos")


def _input(spark):
    # values interleaved so consecutive global ranks span pids; physical
    # layout scrambled so pid != any partition accident
    rows = [(i, (i * 7919) % 1000 + 1) for i in range(3000)]
    return (
        spark.createDataFrame(rows, "k long, v long")
        .repartition(13)
    )


def _run(spark, df) -> list[tuple]:
    out, total = distributed_prefix_sum(
        spark,
        df,
        pid=(F.col("k") / 500).cast("int"),  # value-derived, monotone in k
        order=[F.col("k")],
        value_col="v",
        cum_col="cum",
        rank_col="rank",
    )
    got = sorted(
        (r["k"], r["v"], r["cum"], r["rank"]) for r in out.collect()
    )
    out.unpersist()
    return got, total


def test_identical_with_and_without_persist(spark, monkeypatch):
    df = _input(spark)
    baseline, total0 = _run(spark, df)

    # chaos: no caching anywhere — offsets pass, window pass, and the
    # materialize step each recompute the tagged frame from scratch
    monkeypatch.setattr(DataFrame, "persist", lambda self, *a: self)
    monkeypatch.setattr(DataFrame, "unpersist", lambda self, *a: self)
    chaos, total1 = _run(spark, df)

    assert chaos == baseline
    assert total0 == total1

    # and both equal the single-threaded global fold
    rows = sorted((k, v) for k, v in ((i, (i * 7919) % 1000 + 1) for i in range(3000)))
    cums = list(itertools.accumulate(v for _, v in rows))
    want = [
        (k, v, c, r + 1) for r, ((k, v), c) in enumerate(zip(rows, cums))
    ]
    assert baseline == want
    assert total0 == cums[-1]
