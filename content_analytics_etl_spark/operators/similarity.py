"""Similarity search over embedding columns (BASELINE extension).

Three tiers, per the scale story:

1. **Brute-force cosine top-k** (``brute_topk``): broadcast the query
   set, fold-based dot products (functions/vectors.py), per-query
   window top-k. Exact, deterministic, oracle-checkable. Cost is
   O(|queries| × |corpus| × dim) — the right baseline, and fine whenever
   the query set is small enough to broadcast.
2. **Random-hyperplane LSH** (``hyperplane_signature``): ±1 plane
   matrix generated deterministically (md5-seeded, reproducible in any
   engine), signature = sign-bit vector of plane dots packed into an
   int; equi-join on the signature bucket → candidates → exact cosine
   verify. Linear shuffle instead of the quadratic pair scan — the
   100 TB path for near-dup detection.
3. **Pandas-UDF batch matmul** (``brute_topk_matmul``): Arrow-batched
   numpy matmul against the broadcast query matrix — the throughput
   variant of tier 1 (~10-100× less per-row overhead). NOT bit-identical
   to the fold (BLAS reassociates float adds), so it backs benchmarks,
   not oracle checks.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.vectors import dot_product, l2_norm, to_double_array

__all__ = [
    "hyperplane_matrix",
    "brute_topk",
    "add_hyperplane_bucket",
    "brute_topk_matmul",
]


def hyperplane_matrix(n_planes: int, dim: int, seed: str = "lsh") -> list[list[float]]:
    """Deterministic ±1 hyperplane matrix: sign of bit 0 of
    md5(seed|plane|dim). Reproducible anywhere (incl. SQL oracles) —
    no RNG state involved."""
    return [
        [
            1.0
            if int(hashlib.md5(f"{seed}|{p}|{i}".encode()).hexdigest()[:15], 16) & 1
            else -1.0
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def brute_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` rows per ``queries`` row
    (self-matches excluded). The query side is broadcast — the corpus is
    never shuffled, scaling to any corpus size with a bounded query set."""
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        to_double_array(vec_col).alias("cvec"),
    ).withColumn("cnorm", l2_norm(F.col("cvec")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        to_double_array(vec_col).alias("qvec"),
    ).withColumn("qnorm", l2_norm(F.col("qvec")))

    pairs = c.join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "cand_id",
        (
            dot_product(F.col("qvec"), F.col("cvec"))
            / (F.col("qnorm") * F.col("cnorm"))
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def add_hyperplane_bucket(
    df: DataFrame,
    planes: list[list[float]],
    *,
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Signature bucket = Σ_p (sign(v·plane_p) << p). Plane dots are
    fold expressions over literal arrays — no UDF, engine-reproducible."""
    v = to_double_array(vec_col)
    bucket = F.lit(0).cast("bigint")
    for p, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(x) for x in plane])
        dot = dot_product(v, plane_col)
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast(
            "bigint"
        )
    return df.withColumn(out_col, bucket)


def brute_topk_matmul(
    corpus: DataFrame,
    queries_pdf,  # pandas DataFrame: id + list-of-float vectors
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Throughput variant: numpy matmul per Arrow batch against the
    broadcast query matrix. Returns (query_id, cand_id, cosine) rows;
    top-k selection still via window (exact)."""
    import numpy as np

    q_ids = queries_pdf[id_col].to_numpy()
    q_mat = np.stack(queries_pdf[vec_col].to_numpy()).astype("float64")
    q_norm = np.linalg.norm(q_mat, axis=1)

    def score(batches: Iterator):
        import pandas as pd

        for pdf in batches:
            c_mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            c_ids = pdf[id_col].to_numpy()
            c_norm = np.linalg.norm(c_mat, axis=1)
            sims = (c_mat @ q_mat.T) / np.outer(c_norm, q_norm)
            n_c, n_q = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.tile(q_ids, n_c),
                    "cand_id": np.repeat(c_ids, n_q),
                    "cosine": sims.ravel(),
                }
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, schema="query_id long, cand_id long, cosine double"
    ).filter(F.col("query_id") != F.col("cand_id"))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
