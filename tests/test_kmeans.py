"""Contracts for the iterative k-means operator (operators/kmeans.py):
Lloyd monotonicity, bit-determinism across runs and partitionings, and
complete assignment."""

from __future__ import annotations

from pyspark.sql import functions as F

from content_analytics_etl_spark.functions.vectors import to_double_array
from content_analytics_etl_spark.operators.kmeans import (
    _centroid_df,
    assign_clusters,
    kmeans_fit,
)
from content_analytics_etl_spark.sources.readers import load_table

K = 4
ITERS = 3


def _corpus(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )


def test_kmeans_sse_monotone_and_complete(spark, sf_dir):
    e = _corpus(spark, sf_dir)
    n = e.count()
    model = kmeans_fit(e, k=K, iters=ITERS)
    # Lloyd: each assign+update pair can only lower total SSE
    assert all(
        a >= b - 1e-9 for a, b in zip(model.sse_history, model.sse_history[1:])
    )
    assigned = assign_clusters(e, _centroid_df(spark, model.centroids))
    assert assigned.count() == n  # every vector lands in exactly one cluster
    assert assigned.select("cid").distinct().count() <= K


def test_kmeans_bit_deterministic_across_partitionings(spark, sf_dir):
    """Decimal-exact centroid sums ⇒ identical bits regardless of
    parallelism — the same invariance contract as the oracle-checked
    queries, asserted here by re-running under a different partition
    count."""
    e = _corpus(spark, sf_dir)
    m1 = kmeans_fit(e, k=K, iters=ITERS)
    m2 = kmeans_fit(e.repartition(3), k=K, iters=ITERS)
    assert m1.sse_history == m2.sse_history
    assert m1.centroids == m2.centroids
