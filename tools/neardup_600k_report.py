"""600k-vector near-dup evidence run (VERDICT r12 #2/#3).

Measures, on the embeddings-only scratch corpus (.scratch/emb600k):
- the clustered path: index build seconds (producer), full-corpus
  pair-scan wall + n_pairs, distinct candidates, recall@0.45 on the
  vec_id < EXACT_CAP subpopulation vs the exact truth;
- the LSH path: FULL-corpus verified pairs (the run PERF 74 could not
  complete in ~77 GB of disk with the old distinct-then-join-vectors
  chain: ~250 GB of sort-merge spill) + wall + recall on the same
  subpopulation;
- per-phase shuffle write bytes from the Spark REST status API, the
  measurement VERDICT r12 #3 asks for.

Usage: python tools/neardup_600k_report.py [SF_DIR] [OUT.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import content_analytics_etl_spark.plans.similarity_queries as sq  # noqa: E402
from content_analytics_etl_spark import cache  # noqa: E402
from content_analytics_etl_spark.session import get_spark  # noqa: E402


def shuffle_write_bytes(ui: str) -> int:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
    )
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/emb600k"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark(
        "neardup-600k", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = "http://localhost:4040"
    out: dict = {"sf_dir": sf_dir}
    out["n_vectors"] = sq.t(spark, sf_dir, "embeddings").count()
    exact = sq.sim_neardup_exact(spark, sf_dir).count()
    out["n_exact_pairs_cap"] = exact

    # --- clustered: build, then scan ---
    sw0 = shuffle_write_bytes(ui)
    t0 = time.monotonic()
    sq._clus_assigned(spark, sf_dir)  # forces the index build
    out["clustered_build_seconds"] = round(time.monotonic() - t0, 1)
    out["clustered_build_shuffle_write_bytes"] = shuffle_write_bytes(ui) - sw0
    crow = sq._clus_params_rel(
        sq._clus_assigned(spark, sf_dir).select("vec_id").distinct()
    ).collect()[0]
    out["clustered_k"], out["clustered_s"] = crow["k"], crow["s"]
    sw0 = shuffle_write_bytes(ui)
    t0 = time.monotonic()
    pairs = sq.sim_neardup_clustered(spark, sf_dir).select("vec_a", "vec_b")
    out["clustered_n_pairs_full"] = pairs.count()
    out["clustered_scan_seconds"] = round(time.monotonic() - t0, 1)
    out["clustered_scan_shuffle_write_bytes"] = shuffle_write_bytes(ui) - sw0
    capped = pairs.filter(
        (F.col("vec_a") < sq.EXACT_CAP) & (F.col("vec_b") < sq.EXACT_CAP)
    ).count()
    out["clustered_recall_cap"] = round(capped / exact, 4) if exact else None
    t0 = time.monotonic()
    out["clustered_n_candidates"] = sq._clus_cand_pairs(spark, sf_dir)[0].count()
    out["clustered_cand_count_seconds"] = round(time.monotonic() - t0, 1)
    print(json.dumps(out), flush=True)

    # --- LSH: full-corpus bucket-local verify (skippable: the 2.4M
    # uncapped-regime run measures the CLUSTERED path only — LSH's
    # linear cost and recall decay are already measured to 600k) ---
    if not os.environ.get("SPARK_GRAFT_ND_SKIP_LSH"):
        emb = sq.t(spark, sf_dir, "embeddings")
        prow = sq._nd_params_rel(emb).collect()[0]
        out["lsh_w"], out["lsh_nb"] = prow["w"], prow["nb"]
        sw0 = shuffle_write_bytes(ui)
        t0 = time.monotonic()
        lpairs = sq.sim_neardup_pairs(spark, sf_dir).select("vec_a", "vec_b")
        out["lsh_n_pairs_full"] = lpairs.count()
        out["lsh_pairs_seconds"] = round(time.monotonic() - t0, 1)
        out["lsh_pairs_shuffle_write_bytes"] = shuffle_write_bytes(ui) - sw0
        lcapped = lpairs.filter(
            (F.col("vec_a") < sq.EXACT_CAP) & (F.col("vec_b") < sq.EXACT_CAP)
        ).count()
        out["lsh_recall_cap"] = round(lcapped / exact, 4) if exact else None
    out["producer_build_seconds"] = dict(cache.BUILD_SECONDS)
    print(json.dumps(out), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
