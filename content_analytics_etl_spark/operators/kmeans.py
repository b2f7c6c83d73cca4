"""K-means (Lloyd) over ``array<double>`` embedding columns — the
iterative-algorithm operator behind IVF coarse quantization
(plans/similarity_queries.py seeds its cells with corpus vectors; this
is the trainer that would replace that seed at production quality).

Spark-first shape, per iteration:

1. **Assign** — broadcast the k-row centroid relation against the
   corpus, rank-1 window by squared L2 distance (computed as
   ``|v|² − 2·v·c + |c|²`` from fold-based dot products). The corpus
   shuffles once per iteration on vec_id for the window; candidates are
   never pairwise.
2. **Update** — ``posexplode`` assigned vectors → per-(cluster, dim)
   decimal-exact sums → re-assemble the mean vector with
   ``array_sort(collect_list(struct(pos, mean)))``. Decimal sums make
   the centroids bit-identical run to run (double Σ is
   order-dependent; see plans/_util.py policy).
3. **Collect** — the k×dim centroid table (a few KB at any corpus
   scale) is collected to the driver and re-broadcast as literals for
   the next iteration. This is the one legitimate driver materialization
   in the engine: centroids are O(k·dim) by definition, independent of
   corpus size, and collecting them truncates the lineage so iteration
   N's plan doesn't embed iterations 1…N−1.

Empty clusters keep their previous centroid (no NaNs, stable k).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.vectors import dot_product

__all__ = ["KMeansModel", "kmeans_fit", "assign_clusters"]

_DEC = "decimal(28,12)"


@dataclass
class KMeansModel:
    centroids: list[list[float]]  # k × dim
    sse_history: list[float]  # total SSE after each iteration


def _centroid_df(spark: SparkSession, centroids: list[list[float]]) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("cid", T.IntegerType()),
            T.StructField("cv", T.ArrayType(T.DoubleType())),
        ]
    )
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)], schema
    )


def assign_clusters(corpus: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the k-row centroid
    relation, rank-1 window on squared L2 (ties → lowest cid).
    ``corpus`` needs columns (vec_id, v: array<double>)."""
    d2 = (
        dot_product(F.col("v"), F.col("v"))
        - 2.0 * dot_product(F.col("v"), F.col("cv"))
        + dot_product(F.col("cv"), F.col("cv"))
    )
    ranked = (
        corpus.crossJoin(F.broadcast(cent))
        .select("vec_id", "v", "cid", d2.alias("d2"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("cid"))
            ),
        )
    )
    return ranked.filter(F.col("rk") == 1).select("vec_id", "v", "cid", "d2")


def kmeans_fit(
    corpus: DataFrame, *, k: int, iters: int = 5
) -> KMeansModel:
    """Lloyd iterations over ``corpus`` (vec_id, v: array<double>).
    Init = the k lowest-vec_id vectors (deterministic). Returns the
    final centroids and the per-iteration total SSE (decimal-exact, so
    the history is reproducible bit-for-bit)."""
    spark = corpus.sparkSession
    corpus = corpus.persist()  # scanned twice per iteration (update + SSE)
    init = (
        corpus.orderBy("vec_id")
        .limit(k)
        .select("v")
        .collect()
    )
    centroids = [list(r["v"]) for r in init]
    sse_history: list[float] = []
    for _ in range(iters):
        assigned = assign_clusters(corpus, _centroid_df(spark, centroids)).persist()
        per_dim = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(
                (F.sum(F.col("x").cast(_DEC)).cast("double") / F.count(F.lit(1)))
                .alias("m")
            )
        )
        new_rows = (
            per_dim.groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.getField("m"),
                ).alias("cv")
            )
            .collect()
        )
        for r in new_rows:
            centroids[r["cid"]] = list(r["cv"])
        sse = (
            assigned.agg(F.sum(F.col("d2").cast(_DEC)).cast("double").alias("sse"))
            .collect()[0]["sse"]
        )
        sse_history.append(float(sse))
        assigned.unpersist()
    corpus.unpersist()
    return KMeansModel(centroids=centroids, sse_history=sse_history)
