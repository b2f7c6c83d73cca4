"""Round-15 (optimization round 2) pins.

Robustness fixes from ADVICE r14 (both low):
- ``pq_argmin_codes`` must DROP input rows whose ``m`` has no codebook
  entry (the old broadcast inner join's semantics) instead of emitting
  uninitialized garbage codes;
- ``cosine_rank_assign`` must return an empty frame for an empty
  centroid relation (the old HOF chain's behavior) instead of crashing
  on a 1-D ``np.asarray([])`` inside the Arrow worker.

Plus parity/plan pins for this round's optimizations (added alongside
each change).
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401


def test_pq_argmin_drops_unknown_m(spark):
    """Inner-join semantics: a sub-vector whose m is absent from the
    codebook produces NO output row (ADVICE r14)."""
    from content_analytics_etl_spark.operators.similarity import (
        pq_argmin_codes,
    )

    cb_rows = [
        {"m": 0, "k": 1, "cv": [0.0, 0.0]},
        {"m": 0, "k": 2, "cv": [5.0, 5.0]},
    ]
    sub = spark.createDataFrame(
        [
            (10, 0, [0.1, 0.1]),
            (10, 7, [4.0, 4.0]),  # m=7: no codebook entry -> dropped
            (11, 0, [5.0, 5.0]),
        ],
        "vec_id long, m int, subv array<double>",
    )
    got = {
        (r["vec_id"], r["m"], r["k"])
        for r in pq_argmin_codes(sub, cb_rows).collect()
    }
    assert got == {(10, 0, 1), (11, 0, 2)}


def test_pq_argmin_empty_codebook(spark):
    """Degenerate codebook (no vec_id in [1, PQ_KS]): every row drops,
    like the old inner join — not garbage codes."""
    from content_analytics_etl_spark.operators.similarity import (
        pq_argmin_codes,
    )

    sub = spark.createDataFrame(
        [(10, 0, [0.1, 0.1])], "vec_id long, m int, subv array<double>"
    )
    assert pq_argmin_codes(sub, []).count() == 0


def test_cosine_rank_assign_empty_centroids(spark):
    """Empty centroid relation -> empty result with the declared schema
    (the HOF chain's behavior), not an IndexError in the kernel."""
    from content_analytics_etl_spark.operators.similarity import (
        cosine_rank_assign,
    )

    e = spark.createDataFrame(
        [(1, [1.0, 0.0], 1.0)], "vec_id long, v array<double>, nrm double"
    )
    out = cosine_rank_assign(e, [], 4, lambda ids, cranks: cranks == 1)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "vec_id", "v", "nrm", "cell", "cv", "crank",
    ]


def test_d2_argmin_assign_parity(spark, sf001_dir):
    """The Arrow argmin kernel reproduces the HOF struct-pool
    (assign_clusters_literal_hof) AND the window chain
    (assign_clusters) bit-for-bit on real data: same winner cid, same
    winner d2 doubles."""
    from content_analytics_etl_spark.functions.vectors import to_double_array
    from content_analytics_etl_spark.operators.kmeans import (
        assign_clusters,
        assign_clusters_literal_hof,
        d2_argmin_assign,
        _centroid_df,
    )
    from content_analytics_etl_spark.plans._util import t

    e = t(spark, sf001_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    cents = [list(r["v"]) for r in e.orderBy("vec_id").limit(8).collect()]
    want = {
        (r["vec_id"], r["cid"], r["d2"])
        for r in assign_clusters_literal_hof(e, cents).collect()
    }
    want_w = {
        (r["vec_id"], r["cid"], r["d2"])
        for r in assign_clusters(e, _centroid_df(spark, cents)).collect()
    }
    got = {
        (r["vec_id"], r["cid"], r["d2"])
        for r in d2_argmin_assign(e, list(enumerate(cents))).collect()
    }
    assert got == want == want_w
    assert got  # non-vacuous


def test_d2_argmin_tie_order_and_passthrough(spark):
    """Bit-equal d2 ties resolve to the LOWEST cid (the array_min
    lexicographic-struct / row_number rule); passthrough columns and
    non-contiguous cids survive."""
    from content_analytics_etl_spark.operators.kmeans import d2_argmin_assign

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0], "a"), (2, [9.0, 9.0], "b")],
        "vec_id long, v array<double>, tag string",
    )
    # cid 7 duplicates cid 3 exactly -> ties must pick cid 3
    cents = [(7, [1.0, 0.0]), (3, [1.0, 0.0]), (5, [9.0, 9.0])]
    got = {
        (r["vec_id"], r["cid"], r["d2"], r["tag"])
        for r in d2_argmin_assign(
            corpus, cents, passthrough=("tag",)
        ).collect()
    }
    assert got == {(1, 3, 0.0, "a"), (2, 5, 0.0, "b")}
