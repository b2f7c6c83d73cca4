"""CLUS_SUPER_PROBE (p1) ladder on the round-14 cogrouped build
(VERDICT r13 #7): with the vectorized assignment kernel the build is
cheap enough to ladder p1 AT 600k — the r13 recall dip (0.811 vs 0.939
at 60k) is the probed-pool fraction (p1·R/ s cells probed falls as
s = sqrt(N/T) grows), and p1 is the named buy-back knob.

Each ladder point monkeypatches ``sq.CLUS_SUPER_PROBE`` and rebuilds
the persisted index from scratch — ``index_version`` folds the knob
value into the on-disk table name, so every point is a genuine fresh
build (the superseded-snapshot prune drops the previous point's
table), and build seconds come from the producer stamp, not a
read-back.

Usage: python tools/clus_p1_ladder.py [SF_DIR] [P1_LIST] [OUT.json]
  e.g. python tools/clus_p1_ladder.py .scratch/emb600k 12,16,20 \
         evidence/r14/CLUS_KNOBS_600k.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import content_analytics_etl_spark.plans.similarity_queries as sq  # noqa: E402
from content_analytics_etl_spark import cache  # noqa: E402
from content_analytics_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/emb600k"
    points = [
        int(x)
        for x in (sys.argv[2] if len(sys.argv) > 2 else "12,16,20").split(",")
    ]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    spark = get_spark("clus-p1-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": sf_dir, "ladder": []}
    out["n_vectors"] = sq.t(spark, sf_dir, "embeddings").count()
    exact = sq.sim_neardup_exact(spark, sf_dir).count()
    out["exact_cap_pairs"] = exact
    for p1 in points:
        sq.CLUS_SUPER_PROBE = p1
        t0 = time.monotonic()
        sq._clus_assigned(spark, sf_dir)  # fresh build: version keys on p1
        build_s = round(time.monotonic() - t0, 1)
        t0 = time.monotonic()
        pairs = sq.sim_neardup_clustered(spark, sf_dir).select(
            "vec_a", "vec_b"
        )
        n_pairs = pairs.count()
        scan_s = round(time.monotonic() - t0, 1)
        capped = pairs.filter(
            (F.col("vec_a") < sq.EXACT_CAP) & (F.col("vec_b") < sq.EXACT_CAP)
        ).count()
        n_cand = sq._clus_cand_pairs(spark, sf_dir)[0].count()
        row = {
            "p1": p1,
            "build_seconds": build_s,
            "scan_seconds": scan_s,
            "n_pairs_full": n_pairs,
            "n_candidates": n_cand,
            "recall_cap": round(capped / exact, 4) if exact else None,
            "producer_build_seconds": cache.BUILD_SECONDS.get("clus_assigned"),
        }
        out["ladder"].append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps(out), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
