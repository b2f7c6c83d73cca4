"""Radius-search recall, scaled-probed vs legacy fixed-bucket posture.

VERDICT r11 #4 + ADVICE r11 #3: ``sim_range_search`` (hit-level view)
candidates come from the corpus-size-scaled band index with Hamming-≤1
query-side probing, while its rollup twin ``sim_semantic_decontaminate``
still uses the legacy fixed 4×8-bit bucket path — the two contamination
views could disagree on marginal hits.  This report measures BOTH
postures' recall at the same ``SEMDECON_COSINE`` threshold against the
EXACT truth (bounded ≤20-row query side × corpus — linear, uncapped),
so the migration decision is made on evidence.

Usage: python tools/range_recall_report.py SF_DIR [OUT.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from content_analytics_etl_spark.functions.vectors import (  # noqa: E402
    dot_product,
    l2_norm,
    to_double_array,
)
from content_analytics_etl_spark.operators.similarity import (  # noqa: E402
    hyperplane_bucket_agg,
)
from content_analytics_etl_spark.plans._util import t  # noqa: E402
from content_analytics_etl_spark.plans.similarity_queries import (  # noqa: E402
    DIM,
    ND_BANDS,
    ND_BAND_BITS,
    SEMDECON_COSINE,
    _band_rows,
    _nd_params_rel,
    _query_side,
    sim_range_search,
)
from content_analytics_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    spark = get_spark("range-recall-report")
    spark.sparkContext.setLogLevel("ERROR")
    emb = t(spark, sf_dir, "embeddings")
    n_vec = emb.count()
    prow = _nd_params_rel(emb).collect()[0]
    e = (
        emb.select("vec_id", to_double_array("embedding").alias("v"))
        .withColumn("nrm", l2_norm(F.col("v")))
    )
    eq = e.filter(_query_side()).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    ec = e.filter(~_query_side()).select(
        F.col("vec_id").alias("cand_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    cos = dot_product(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    n_exact = (
        ec.join(F.broadcast(eq), F.lit(True))
        .filter(cos >= SEMDECON_COSINE)
        .count()
    )

    # scaled + query-side-probed posture (sim_range_search itself)
    t0 = time.monotonic()
    n_scaled = sim_range_search(spark, sf_dir).count()
    scaled_wall = time.monotonic() - t0

    # legacy fixed 4×8-bit bucket posture (sim_semantic_decontaminate's
    # candidate generator, counted at hit level)
    t0 = time.monotonic()
    eval_bands = _band_rows(
        hyperplane_bucket_agg(
            emb.filter(_query_side()), ND_BANDS * ND_BAND_BITS, DIM
        )
    ).select(F.col("vec_id").alias("query_id"), "band_idx", "band_key")
    train_bands = _band_rows(
        hyperplane_bucket_agg(
            emb.filter(~_query_side()), ND_BANDS * ND_BAND_BITS, DIM
        )
    )
    cand = (
        train_bands.join(F.broadcast(eval_bands), ["band_idx", "band_key"])
        .select(F.col("vec_id").alias("cand_id"), "query_id")
        .distinct()
    )
    n_legacy = (
        cand.join(eq, "query_id")
        .join(ec, "cand_id")
        .filter(cos >= SEMDECON_COSINE)
        .count()
    )
    legacy_wall = time.monotonic() - t0

    out = {
        "sf_dir": sf_dir,
        "n_vectors": n_vec,
        "threshold": SEMDECON_COSINE,
        "n_exact_hits": n_exact,
        "scaled_probed": {
            "w": prow["w"],
            "nb": prow["nb"],
            "n_hits": n_scaled,
            "recall": (n_scaled / n_exact) if n_exact else None,
            "wall_seconds": round(scaled_wall, 3),
        },
        "legacy_fixed": {
            "bands": ND_BANDS,
            "band_bits": ND_BAND_BITS,
            "n_hits": n_legacy,
            "recall": (n_legacy / n_exact) if n_exact else None,
            "wall_seconds": round(legacy_wall, 3),
        },
    }
    print(json.dumps(out))
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
