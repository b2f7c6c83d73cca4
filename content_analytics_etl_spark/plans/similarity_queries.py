"""Similarity-search queries over ``embeddings`` (BASELINE extension):
brute-force cosine top-k (the exact baseline), all-pairs near-dup
detection, and hyperplane-LSH bucketed ANN (the scale path). All
oracle-checked — the fold-based double arithmetic is bit-identical in
DuckDB (verified), and the LSH planes are md5-seeded so both engines
build the same planes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.vectors import dot_product, l2_norm, to_double_array
from ..operators.kmeans import _centroid_df, assign_clusters, kmeans_fit
from ..operators.similarity import add_hyperplane_bucket, brute_topk, hyperplane_matrix
from ._util import t

DIM = 64
TOPK = 5
ANN_TOPK = 3
N_PLANES = 6
NEARDUP_COSINE = 0.45
QUERY_MOD = 50  # query set = vec_id % 50 == 0
IVF_CELLS = 8
IVF_NPROBE = 2

PLANES = hyperplane_matrix(N_PLANES, DIM)


def sim_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for the deterministic query subset."""
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % QUERY_MOD == 0)
    return brute_topk(e, q, k=TOPK)


def sim_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine near-dup detection above a threshold (the exact
    quadratic form; LSH below is the linear-shuffle replacement)."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    ).withColumn("norm", l2_norm(F.col("v")))
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("norm").alias("na")
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("norm").alias("nb")
    )
    cos = dot_product(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= NEARDUP_COSINE)
    )


def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: 6-plane signature buckets (64 buckets), candidates = bucket
    collisions, exact cosine re-rank, top-3 per query. The bucket join is
    linear in corpus size — the at-scale ANN form."""
    e = t(spark, sf_dir, "embeddings")
    bucketed = add_hyperplane_bucket(e, PLANES).select(
        "vec_id", "bucket", to_double_array("embedding").alias("v")
    ).withColumn("norm", l2_norm(F.col("v")))

    q = bucketed.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("bucket").alias("qbucket"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
    )
    c = bucketed.select(
        F.col("vec_id").alias("cand_id"),
        F.col("bucket").alias("cbucket"),
        F.col("v").alias("cv"),
        F.col("norm").alias("cn"),
    )
    cos = dot_product(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("cbucket") == F.col("qbucket"))
            & (F.col("cand_id") != F.col("query_id")),
        )
        .select("query_id", "cand_id", cos.alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= ANN_TOPK
    )


def sim_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse quantization into IVF_CELLS cells, queries
    probe their IVF_NPROBE nearest cells, exact cosine re-rank, top-3.

    Centroids are the first IVF_CELLS corpus vectors (a deterministic
    seed choice — production would k-means them; the *plan shape* is the
    point). Everything is relational: assignment = broadcast cross join
    against the 8-row centroid relation + per-vector rank-1 window —
    corpus shuffles once on vec_id, never pairwise. Candidate join is an
    equi-join on the cell id: linear shuffle, the IVF scale property."""
    e = (
        t(spark, sf_dir, "embeddings")
        .select("vec_id", to_double_array("embedding").alias("v"))
        .withColumn("nrm", l2_norm(F.col("v")))
    )
    cent = e.filter(F.col("vec_id").between(1, IVF_CELLS)).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    cs = dot_product(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
    ranked = (
        e.crossJoin(F.broadcast(cent))
        .select("vec_id", "v", "nrm", "cid", cs.alias("cs"))
        .withColumn(
            "crank",
            F.row_number().over(
                W.partitionBy("vec_id").orderBy(F.col("cs").desc(), F.col("cid"))
            ),
        )
    )
    corpus = ranked.filter(F.col("crank") == 1).select(
        F.col("vec_id").alias("cand_id"),
        F.col("v").alias("cvec"),
        F.col("nrm").alias("cnorm"),
        F.col("cid").alias("cell"),
    )
    probes = ranked.filter(
        (F.col("crank") <= IVF_NPROBE) & (F.col("vec_id") % QUERY_MOD == 0)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qvec"),
        F.col("nrm").alias("qnorm"),
        F.col("cid").alias("cell"),
    )
    cos = dot_product(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))
    scored = (
        corpus.join(F.broadcast(probes), "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", cos.alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= ANN_TOPK
    )


def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means(k=8, 3 Lloyd iterations) over the embedding corpus →
    per-cluster size and decimal-exact SSE (operators/kmeans.py). An
    iterative algorithm with per-iteration driver round-trips of the
    O(k·dim) centroid table only — NOT SQL-expressible, so this entry
    takes the driver's rows-only check; the bit-determinism, SSE
    monotonicity, and partition-count invariance contracts are asserted
    in tests/test_kmeans.py."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    model = kmeans_fit(e, k=IVF_CELLS, iters=3)
    assigned = assign_clusters(e, _centroid_df(spark, model.centroids))
    return assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.col("d2").cast("decimal(28,12)")).cast("double").alias("sse"),
    )


QUERIES = {
    "sim_brute_topk": sim_brute_topk,
    "sim_neardup_pairs": sim_neardup_pairs,
    "sim_ann_lsh_topk": sim_ann_lsh_topk,
    "sim_ann_ivf_topk": sim_ann_ivf_topk,
    "embedding_kmeans": embedding_kmeans,
}

# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_V = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
_DOT = "list_sum(list_transform(range(1, {d}+1), i -> {a}[i] * {b}[i]))".format
_E_CTE = f"""
  SELECT vec_id, {_V} AS v,
         sqrt({_DOT(d=DIM, a=_V, b=_V)}) AS nrm
  FROM embeddings
"""


def _plane_literal(plane: list[float]) -> str:
    return "[" + ", ".join(f"{x:.1f}" for x in plane) + "]"


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN list_sum(list_transform(range(1, {DIM}+1), "
    f"i -> v[i] * ({_plane_literal(p)})[i])) > 0 THEN {1 << pi} ELSE 0 END)"
    for pi, p in enumerate(PLANES)
)

ORACLES = {
    "sim_brute_topk": f"""
        WITH e AS ({_E_CTE}),
        q AS (SELECT * FROM e WHERE vec_id % {QUERY_MOD} = 0),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                 {_DOT(d=DIM, a="q.v", b="c.v")} / (q.nrm * c.nrm) AS cosine
          FROM e c JOIN q ON c.vec_id <> q.vec_id
        )
        SELECT query_id, cand_id, cosine, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, cand_id) AS rank
          FROM scored)
        WHERE rank <= {TOPK}
    """,
    "sim_neardup_pairs": f"""
        WITH e AS ({_E_CTE})
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_DOT(d=DIM, a="a.v", b="b.v")} / (a.nrm * b.nrm) AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE {_DOT(d=DIM, a="a.v", b="b.v")} / (a.nrm * b.nrm) >= {NEARDUP_COSINE}
    """,
    "sim_ann_ivf_topk": f"""
        WITH e AS ({_E_CTE}),
        cent AS (
          SELECT vec_id AS cid, v AS cv, nrm AS cn
          FROM e WHERE vec_id BETWEEN 1 AND {IVF_CELLS}
        ),
        ranked AS (
          SELECT vec_id, v, nrm, cid,
                 row_number() OVER (
                   PARTITION BY vec_id
                   ORDER BY {_DOT(d=DIM, a="v", b="cv")} / (nrm * cn) DESC, cid
                 ) AS crank
          FROM e CROSS JOIN cent
        ),
        corpus AS (
          SELECT vec_id AS cand_id, v AS cvec, nrm AS cnorm, cid AS cell
          FROM ranked WHERE crank = 1
        ),
        probes AS (
          SELECT vec_id AS query_id, v AS qvec, nrm AS qnorm, cid AS cell
          FROM ranked WHERE crank <= {IVF_NPROBE} AND vec_id % {QUERY_MOD} = 0
        ),
        scored AS (
          SELECT query_id, cand_id,
                 {_DOT(d=DIM, a="qvec", b="cvec")} / (qnorm * cnorm) AS cosine
          FROM corpus JOIN probes USING (cell)
          WHERE cand_id <> query_id
        )
        SELECT query_id, cand_id, cosine, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, cand_id) AS rank
          FROM scored)
        WHERE rank <= {ANN_TOPK}
    """,
    "sim_ann_lsh_topk": f"""
        WITH e AS ({_E_CTE}),
        bucketed AS (
          SELECT vec_id, v, nrm, {_BUCKET_SQL} AS bucket FROM e
        ),
        q AS (SELECT * FROM bucketed WHERE vec_id % {QUERY_MOD} = 0),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                 {_DOT(d=DIM, a="q.v", b="c.v")} / (q.nrm * c.nrm) AS cosine
          FROM bucketed c
          JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
        )
        SELECT query_id, cand_id, cosine, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, cand_id) AS rank
          FROM scored)
        WHERE rank <= {ANN_TOPK}
    """,
}
