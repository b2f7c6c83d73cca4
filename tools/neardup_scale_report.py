"""Candidate-count / recall evidence for the scaled LSH band knobs.

For one sf_dir, reports (VERDICT r9 #2 / r10 #1's asked-for columns):
- n_vectors and the effective band width w AND band count nb the
  1-row params relation derives;
- n_candidates: distinct band-colliding pairs BEFORE cosine verify
  (the quantity the width knob exists to keep linear in N);
- n_pairs: verified near-dup pairs emitted;
- recall vs exact on the vec_id < EXACT_CAP subpopulation: the banded
  pairs under the cap over sim_neardup_exact's exhaustive pairs under
  the same cap (both sides verify the same cosine threshold, so the
  banded set is a subset and the ratio IS recall@threshold).

Usage: python tools/neardup_scale_report.py SF_DIR [OUT.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from content_analytics_etl_spark.operators.similarity import (  # noqa: E402
    hyperplane_band_rows,
)
from content_analytics_etl_spark.plans.similarity_queries import (  # noqa: E402
    DIM,
    EXACT_CAP,
    ND_MAX_BANDS,
    ND_MAX_BITS,
    _nd_params_rel,
    sim_neardup_exact,
    sim_neardup_pairs,
)
from content_analytics_etl_spark.plans._util import t  # noqa: E402
from content_analytics_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    spark = get_spark("neardup-scale-report")
    spark.sparkContext.setLogLevel("ERROR")
    emb = t(spark, sf_dir, "embeddings")
    n_vec = emb.count()
    prow = _nd_params_rel(emb).collect()[0]
    w, nb = prow["w"], prow["nb"]
    params = _nd_params_rel(emb)
    bands = hyperplane_band_rows(
        emb, params, ND_MAX_BANDS, ND_MAX_BITS, DIM
    )
    # Hamming-<=1 probe rows, mirroring sim_neardup_pairs exactly
    probes = (
        bands.crossJoin(F.broadcast(params.select("w")))
        .select(
            "vec_id",
            "band_idx",
            F.explode(
                F.expr(
                    "transform(sequence(0, w), j -> CASE WHEN j = 0 "
                    "THEN band_key ELSE band_key ^ "
                    "shiftleft(CAST(1 AS BIGINT), j - 1) END)"
                )
            ).alias("band_key"),
        )
    )
    a, b = probes.alias("a"), bands.alias("b")
    n_cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id"), F.col("b.vec_id"))
        .distinct()
        .count()
    )
    pairs = sim_neardup_pairs(spark, sf_dir).select("vec_a", "vec_b")
    n_pairs = pairs.count()
    capped = pairs.filter(
        (F.col("vec_a") < EXACT_CAP) & (F.col("vec_b") < EXACT_CAP)
    ).count()
    exact = sim_neardup_exact(spark, sf_dir).count()
    out = {
        "sf_dir": sf_dir,
        "n_vectors": n_vec,
        "band_width_bits": w,
        "n_bands": nb,
        "n_candidates": n_cand,
        "n_pairs": n_pairs,
        "n_exact_pairs_cap": exact,
        "n_banded_pairs_cap": capped,
        "recall_at_threshold_cap": (capped / exact) if exact else None,
    }
    print(json.dumps(out))
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
