"""Exact prefix filtering (dedup_ngram_jaccard_prefix) — result parity
with the exhaustive inverted-index form is a theorem (see the query
docstring); these tests assert it holds on real data and that the
prefix actually prunes the index (the point of the exercise)."""

from __future__ import annotations

from pyspark.sql import functions as F

from content_analytics_etl_spark.operators.dedup import shingle_rows
from content_analytics_etl_spark.plans.dedup_queries import (
    JACCARD_THRESHOLD,
    dedup_ngram_jaccard,
    dedup_ngram_jaccard_prefix,
)
from content_analytics_etl_spark.plans._util import t

SF = "/root/testdata/sf0.01"


def _pairs(df) -> list[tuple]:
    return sorted(
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 12)) for r in df.collect()
    )


def test_prefix_parity_with_exhaustive(spark):
    naive = _pairs(dedup_ngram_jaccard(spark, SF))
    prefix = _pairs(dedup_ngram_jaccard_prefix(spark, SF))
    assert naive == prefix
    assert len(naive) > 0  # non-vacuous: the corpus has near-dup pairs


def test_prefix_prunes_posting_lists(spark):
    d = t(spark, SF, "documents")
    rows = shingle_rows(d, ["doc_id", "lang"])
    full = rows.count()
    df_tab = rows.groupBy("lang", "shingle").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql import Window as W

    ranked = (
        rows.join(df_tab, ["lang", "shingle"])
        .withColumn("sz", F.count(F.lit(1)).over(W.partitionBy("doc_id")))
        .withColumn(
            "rnk",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy(
                    F.col("df").asc(), F.col("shingle").asc()
                )
            ),
        )
    )
    kept = ranked.filter(
        F.col("rnk")
        <= F.col("sz") - F.ceil(F.lit(JACCARD_THRESHOLD) * F.col("sz")) + 1
    ).count()
    # at t=0.5 the prefix keeps just over half of each doc's shingles
    assert kept < 0.65 * full
    # the hottest shingle's posting list shrinks: compare max DF in the
    # full index vs within the prefix index
    hottest_full = df_tab.agg(F.max("df")).collect()[0][0]
    prefix_df = (
        ranked.filter(
            F.col("rnk")
            <= F.col("sz") - F.ceil(F.lit(JACCARD_THRESHOLD) * F.col("sz")) + 1
        )
        .groupBy("lang", "shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df"))
        .collect()[0][0]
    )
    assert prefix_df <= hottest_full
