"""AQE skew-join splitting, observed rather than assumed (SCALE.md's
skew story names it as the runtime backstop behind the salted join).

Local data is KBs, so AQE's default 256 MB skew threshold would never
fire; the probe lowers the thresholds (a knob, not a code change) and
asserts the mechanism actually engages on a join→write plan: the final
adaptive plan marks the sort-merge join ``skew=true``, and the joined
result matches the broadcast twin row for row.

A finding worth keeping (learned while building this probe): when the
skewed join feeds a SAME-KEY aggregation, AQE legitimately SKIPS the
split — splitting a partition would break the aggregation's required
distribution and cost an extra shuffle. That is the
``join_salted``/pre-aggregation niche: AQE's backstop covers
join-then-sink, not join-then-groupBy-on-the-join-key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def _skewed_frames(spark):
    # key 0 carries ~87% of the fact side; broadcast is disabled so the
    # join must shuffle and the hot partition is unavoidable pre-AQE
    fact = spark.range(400_000).select(
        F.when(F.col("id") % 8 != 0, F.lit(0)).otherwise(F.col("id") % 97).alias("k"),
        (F.col("id") * 3 % 1000).alias("v"),
    )
    dim = spark.range(97).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )
    return fact, dim


def test_aqe_splits_the_skewed_partition(spark):
    old = {k: spark.conf.get(k, None) for k in SKEW_CONFS}
    try:
        for k, v in SKEW_CONFS.items():
            spark.conf.set(k, v)
        fact, dim = _skewed_frames(spark)
        joined = fact.join(dim, "k").select("k", "v", "label")
        # execute THIS DataFrame's own QueryExecution (a .write/.count
        # builds a separate plan instance whose adaptive final plan we
        # could not inspect; collect() finalizes the one we hold)
        n_rows = len(joined.collect())
        assert n_rows == 400_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]

        # parity under the same confs: aggregate of the skew-split join
        # equals the broadcast-join truth
        got = {
            r["k"]: (r["n"], r["sv"])
            for r in joined.groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
            .collect()
        }
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    fact, dim = _skewed_frames(spark)
    truth = {
        r["k"]: (r["n"], r["sv"])
        for r in fact.join(F.broadcast(dim), "k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        .collect()
    }
    assert got == truth
    # the hot key really is hot: 7/8 of the table plus the id%8==0 rows
    # whose id%97 also lands on 0
    assert got[0][0] >= 350_000


def test_same_key_aggregate_skips_the_split(spark):
    """The negative half of the finding: join feeding a same-key groupBy
    keeps ensureRequirements' distribution, so AQE does NOT split — the
    niche where explicit salting / pre-aggregation still earns its keep."""
    old = {k: spark.conf.get(k, None) for k in SKEW_CONFS}
    try:
        for k, v in SKEW_CONFS.items():
            spark.conf.set(k, v)
        fact, dim = _skewed_frames(spark)
        agg = fact.join(dim, "k").groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        agg.write.format("noop").mode("overwrite").save()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "skew=true" not in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
