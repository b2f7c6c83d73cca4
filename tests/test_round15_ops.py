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
