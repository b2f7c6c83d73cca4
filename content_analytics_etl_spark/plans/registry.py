"""Merge every plan module's QUERIES/ORACLES into the driver contract.

Ordering contract
-----------------
The verification driver hashes the FIRST 50 ``queries()`` entries in
registration order (round-1 evidence: CORRECTNESS_r01.json == the first 50
registry-order names).  Module-order registration therefore left the entire
extension surface (events / text / dedup / similarity / temporal / multimodal
/ tpch q20-22) without a hard driver verdict.

``DRIVER_WINDOW`` below pins an explicit 50-name prefix that covers every
query family: all 8 reference (§2) queries, relational + TPC-H
representatives, and multiple entries from each extension family.  Everything
not named in the window is appended afterwards in module order, so if the
driver's cap is ever lifted the full surface is still registered.  A
registration-time assertion keeps the window consistent with the module
contents (no typos, no misses).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    analytics_queries,
    curation_queries,
    dedup_queries,
    graph_queries,
    multimodal_queries,
    events_queries,
    reference_queries,
    relational_queries,
    similarity_queries,
    temporal_queries,
    text_queries,
    tpch_deep_queries,
    tpch_queries,
)

_MODULES = [
    reference_queries,
    relational_queries,
    tpch_queries,
    tpch_deep_queries,
    events_queries,
    analytics_queries,
    temporal_queries,
    text_queries,
    dedup_queries,
    curation_queries,
    similarity_queries,
    multimodal_queries,
    graph_queries,
]

# The first 50 names the driver will hash.  One line per family block.
#
# Round-4 rotation candidates (added in round 3, no driver verdict yet):
# doc_ngram_scrub, doc_token_novelty, token_cms_heavy_hitters, doc_chunk,
# doc_winnow, sim_semantic_decontaminate, multimodal_image_resize,
# multimodal_audio_windows, multimodal_frame_decode,
# corpus_curation_manifest — swap in for double-green slots next round.
#
# Round-3 rotation: 10 slots whose queries were already driver-green in
# BOTH r01 and r02 (pivot_nulls, join_inner, window_running,
# events_sliding, events_approx_distinct, events_asof_forward,
# doc_subword_counts, dedup_exact, sim_brute_topk, kmeans_assign) were
# swapped for 10 queries that had never received a hard driver verdict
# (VERDICT r2 #6).  Every family keeps ≥1 representative; lifetime
# driver-verified distinct queries after r03 ≥ 60.
DRIVER_WINDOW: list[str] = [
    # reference (§2 core) — 7 of 8 (pivot_nulls rotated out, double-green)
    "flagship_profile",
    "category_recode",
    "sentinel_filter_3vl",
    "device_count_rows",
    "device_count_distinct",
    "pivot_explicit",
    "union_strategy2",
    # relational: salted-skew + the never-verified bucketed shuffle-free join
    "join_salted",
    "join_bucketed",
    # TPC-H: q1 as the family representative + the three deep queries
    "tpch_q1_pricing_summary",
    "tpch_q20_excess_suppliers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_sales_opportunity",
    # events (+ the z-order clustering layout audit, never verified)
    "events_partition_pruned",
    "events_session",
    "events_json_props",
    "events_zorder_layout",
    # warehouse ops: small-file compaction round-trip (new; tumbling
    # rotated out, driver-green r01+r02)
    "warehouse_compact_roundtrip",
    # analytics (+ the CDC MERGE upsert, never verified)
    "events_gapfill_locf",
    "dim_scd2_upsert",
    "events_funnel",
    "events_cohort_retention",
    "doc_tfidf_top_terms",
    "orders_merge_upsert",
    # temporal — both
    "events_asof_join",
    "events_range_join",
    # text (+ source-mix after its HUGEINT fix, PII scrub, sequence
    # packing, split assignment — none driver-verified before)
    "doc_token_stats",
    "doc_quality",
    "lang_id",
    "doc_source_mix",
    "doc_pii_scrub",
    "doc_pack_sequences",
    "doc_split_assign",
    # graph — both (triangles never verified)
    "graph_pagerank",
    "graph_triangles",
    # dedup
    "dedup_ngram_jaccard_prefix",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_decontaminate",
    # similarity (+ PQ-ADC ANN and int8 quantization, never verified)
    "sim_neardup_pairs",
    "sim_ann_lsh_topk",
    "sim_ann_ivf_topk",
    "sim_ann_pq_adc",
    "embedding_quantize",
    "embedding_kmeans",
    # multimodal — metadata+features (re-verify after their r2 typing
    # fixes), the BMP/WAV round-trip, and the new AVI video round-trip
    # (frame_plan rotated out, driver-green r02)
    "multimodal_metadata",
    "multimodal_features",
    "multimodal_decode",
    "multimodal_video_decode",
]


def _merged() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        out.update(m.QUERIES)
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged = _merged()
    missing = [n for n in DRIVER_WINDOW if n not in merged]
    if missing:
        raise ValueError(f"DRIVER_WINDOW names not registered: {missing}")
    if len(DRIVER_WINDOW) != len(set(DRIVER_WINDOW)):
        raise ValueError("DRIVER_WINDOW contains duplicates")
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        n: merged[n] for n in DRIVER_WINDOW
    }
    for n, fn in merged.items():
        if n not in out:
            out[n] = fn
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
