"""salted_join must be row-identical to the plain join while actually
spreading the hot key: the physical join key must include the salt."""

from __future__ import annotations

from pyspark.sql import functions as F

from content_analytics_etl_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # 90% of rows share one hot key — the classic reducer-killer
    large = spark.range(10_000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 7).alias("k"),
        (F.col("id") * 2).alias("payload"),
    )
    small = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(7)], ["k", "label"]
    )

    salted = salted_join(large, small, "k", salt_from="row_id", n_salts=8)
    plain = large.join(small, "k")

    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}

    plan = salted._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in plan  # the join really keys on (k, _salt)
    assert "_salt" not in salted.columns  # and the salt never leaks out
