"""Candidate-count / recall evidence for BOTH near-dup pair finders.

For one sf_dir, reports (VERDICT r9 #2 / r10 #1 / r11 #1's columns):
- n_vectors and the effective knobs each method's 1-row params
  relation derives (LSH: band width w + band count nb; clustered:
  cell count k);
- per method: n_candidates (pairs BEFORE cosine verify — the linearity
  quantity), n_pairs (verified), wall seconds for the full query, and
  recall vs exact on the vec_id < EXACT_CAP subpopulation (method
  pairs under the cap over sim_neardup_exact's exhaustive pairs under
  the same cap; both verify the same threshold, so method ⊆ exact and
  the ratio IS recall@threshold).

The two methods are sim_neardup_pairs (scaled+probed hyperplane LSH)
and sim_neardup_clustered (SemDeDup-posture cluster-scoped exact scan)
— the VERDICT r11 #1 head-to-head that decides the 100-TB default.

Usage: python tools/neardup_scale_report.py SF_DIR [OUT.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from content_analytics_etl_spark.plans.similarity_queries import (  # noqa: E402
    CLUS_PROBE,
    CLUS_SUPER_PROBE,
    EXACT_CAP,
    _clus_params_rel,
    _nd_candidates,
    _nd_params_rel,
    sim_neardup_clustered,
    sim_neardup_exact,
    sim_neardup_pairs,
    to_double_array,
)
from content_analytics_etl_spark.functions.vectors import l2_norm  # noqa: E402
from content_analytics_etl_spark.plans.similarity_queries import (  # noqa: E402
    _clus_cand_pairs,
)
from content_analytics_etl_spark.plans._util import t  # noqa: E402
from content_analytics_etl_spark.session import get_spark  # noqa: E402


def _method(query_fn, cand_df, exact_n: int) -> dict:
    """(n_candidates, n_pairs, capped recall, wall secs) for one pair
    finder. Wall time covers the full query (candidates + verify), a
    fresh run after the count calls warmed nothing relevant (no
    caching between these lineages)."""
    n_cand = cand_df.count()
    t0 = time.monotonic()
    pairs = query_fn().select("vec_a", "vec_b")
    n_pairs = pairs.count()
    wall = time.monotonic() - t0
    capped = pairs.filter(
        (F.col("vec_a") < EXACT_CAP) & (F.col("vec_b") < EXACT_CAP)
    ).count()
    return {
        "n_candidates": n_cand,
        "n_pairs": n_pairs,
        "n_pairs_cap": capped,
        "recall_at_threshold_cap": (capped / exact_n) if exact_n else None,
        "pairs_wall_seconds": round(wall, 3),
    }


def main() -> None:
    sf_dir = sys.argv[1]
    spark = get_spark("neardup-scale-report")
    spark.sparkContext.setLogLevel("ERROR")
    emb = t(spark, sf_dir, "embeddings")
    n_vec = emb.count()
    prow = _nd_params_rel(emb).collect()[0]
    e = (
        emb.select("vec_id", to_double_array("embedding").alias("v"))
        .withColumn("nrm", l2_norm(F.col("v")))
    )
    crow = _clus_params_rel(e).collect()[0]
    exact = sim_neardup_exact(spark, sf_dir).count()
    lsh = _method(
        lambda: sim_neardup_pairs(spark, sf_dir), _nd_candidates(emb), exact
    )
    clus = _method(
        lambda: sim_neardup_clustered(spark, sf_dir),
        _clus_cand_pairs(spark, sf_dir)[0],
        exact,
    )
    out = {
        "sf_dir": sf_dir,
        "n_vectors": n_vec,
        "n_exact_pairs_cap": exact,
        "lsh": {
            "band_width_bits": prow["w"],
            "n_bands": prow["nb"],
            **lsh,
        },
        "clustered": {
            "k_cells": crow["k"],
            "s_supers": crow["s"],
            "probe_cells": CLUS_PROBE,
            "probe_supers": CLUS_SUPER_PROBE,
            **clus,
        },
    }
    print(json.dumps(out))
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
