"""600k-vector ANN audit capture (r14 optimization evidence).

Mirrors evidence/r13/ANN_600K_R13.json: runs ``sim_ann_recall_audit``
on the embeddings-only scratch corpus, reports per-method recall@10 and
mean candidate counts (MUST reproduce the r13 values — the pq kernel
and audit restructure are bit-exact rewrites), the audit wall, and the
producer build seconds.

Usage: python tools/ann_600k_report.py [SF_DIR] [OUT_JSON]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from content_analytics_etl_spark import cache  # noqa: E402
from content_analytics_etl_spark.plans import all_queries  # noqa: E402
from content_analytics_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/emb600k"
    out = sys.argv[2] if len(sys.argv) > 2 else "evidence/r14/ANN_600K_R14.json"
    spark = get_spark("ann-600k")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    from content_analytics_etl_spark.plans.similarity_queries import (
        _rerank_params_rel,
    )
    from content_analytics_etl_spark.plans._util import t as _t

    e = _t(spark, sf_dir, "embeddings")
    n = e.count()
    rerank_k = _rerank_params_rel(e.select("vec_id")).collect()[0]["rerank_k"]

    t0 = time.time()
    rows = qs["sim_ann_recall_audit"](spark, sf_dir).collect()
    wall = round(time.time() - t0, 1)

    methods: dict[str, dict] = {}
    for r in rows:
        m = methods.setdefault(
            r["method"], {"hits": 0, "true": 0, "cand": 0, "q": 0}
        )
        m["hits"] += r["n_hit"]
        m["true"] += r["n_true"]
        m["cand"] += r["n_candidates"]
        m["q"] += 1
    report = {
        "sf_dir": sf_dir,
        "n_vectors": n,
        "rerank_k": rerank_k,
        "audit_wall_seconds": wall,
        "methods": {
            k: {
                "recall_at_10": round(v["hits"] / v["true"], 3),
                "mean_candidates": round(v["cand"] / v["q"]),
            }
            for k, v in sorted(methods.items())
        },
        "producer_build_seconds": dict(sorted(cache.BUILD_SECONDS.items())),
    }
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
