"""Each pandas UDF must agree with its built-in-expression twin (to
float tolerance — Arrow/numpy reassociate, bit-equality is the
expressions' job, see plans/_util.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from content_analytics_etl_spark.functions.pandas_udfs import (
    l2_norm_pd,
    per_group_trend,
    weighted_mean_pd,
)
from content_analytics_etl_spark.functions.vectors import l2_norm, to_double_array
from content_analytics_etl_spark.sources.readers import load_table


def test_scalar_l2_norm_matches_fold(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").limit(200)
    both = e.select(
        "vec_id",
        l2_norm(to_double_array("embedding")).alias("fold"),
        l2_norm_pd(to_double_array("embedding")).alias("pd"),
    ).collect()
    assert both and all(abs(r["fold"] - r["pd"]) < 1e-9 for r in both)


def test_grouped_agg_weighted_mean(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    udf_side = {
        r["event_type"]: r["wm"]
        for r in ev.select("event_type", F.col("value").alias("v"), k.alias("w"))
        .groupBy("event_type")
        .agg(weighted_mean_pd("v", "w").alias("wm"))
        .collect()
    }
    expr_side = {
        r["event_type"]: r["wm"]
        for r in ev.select("event_type", F.col("value").alias("v"), k.alias("w"))
        .groupBy("event_type")
        .agg((F.sum(F.col("v") * F.col("w")) / F.sum("w")).alias("wm"))
        .collect()
    }
    assert set(udf_side) == set(expr_side)
    assert all(abs(udf_side[t] - expr_side[t]) < 1e-9 for t in expr_side)


def test_apply_in_pandas_trend_matches_covariance(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    udf_side = {r["user_id"]: r["slope"] for r in per_group_trend(ev).collect()}
    t = F.col("ts").cast("double")  # epoch seconds
    expr_side = {
        r["user_id"]: r["slope"]
        for r in ev.groupBy("user_id")
        .agg((F.covar_pop(t, "value") / F.var_pop(t)).alias("slope"))
        .collect()
    }
    assert set(udf_side) == set(expr_side)
    for u, s in expr_side.items():
        assert abs(udf_side[u] - s) < 1e-6, u


def test_udtf_matches_expression_twin(spark, sf_dir):
    from pyspark.sql import functions as F

    from content_analytics_etl_spark.functions.pandas_udfs import (
        split_token_runs_udtf,
    )
    from content_analytics_etl_spark.functions.text_metrics import norm_text
    from content_analytics_etl_spark.sources.readers import load_table

    d = load_table(spark, sf_dir, "documents").limit(50)
    fn = split_token_runs_udtf()
    spark.udtf.register("split_token_runs", fn)
    d.select("doc_id", "text").createOrReplaceTempView("udtf_docs")
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT t.doc_id, t.pos, t.piece, t.cls "
            "FROM udtf_docs, LATERAL split_token_runs(doc_id, text) t"
        ).collect()
    }
    pieces = F.regexp_extract_all(
        norm_text("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]"), 0
    )
    twin = {
        tuple(r)
        for r in d.select(
            "doc_id", F.posexplode(pieces).alias("pos", "piece")
        )
        .withColumn(
            "cls",
            F.when(F.col("piece").rlike("^[a-z]"), "alpha")
            .when(F.col("piece").rlike("^[0-9]"), "digit")
            .otherwise("punct"),
        )
        .collect()
    }
    assert got == twin and got
