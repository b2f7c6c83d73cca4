"""Python-recomputed mirrors for the round-8 third batch (sorted-
neighborhood dedup; later additions append here). The DuckDB hash
oracle is the primary gate; these pin SEMANTICS against an independent
pure-python recompute on sf0.001."""

from __future__ import annotations

import re

import duckdb

from content_analytics_etl_spark.plans.dedup_queries import (
    JACCARD_THRESHOLD,
    SNM_KEY_LEN,
    SNM_WINDOW,
    dedup_sorted_neighborhood,
)


def _norm(text: str) -> str:
    return re.sub(r"\s+", " ", text.lower()).strip()


def _shingles(text: str) -> set:
    toks = _norm(text).split(" ")
    if len(toks) < 3:
        return set()
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def test_sorted_neighborhood_matches_python(spark, sf_dir):
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY 1"
    ).fetchall()
    order = sorted(
        (( _norm(tx)[:SNM_KEY_LEN], did) for did, tx in docs)
    )
    sh = {did: _shingles(tx) for did, tx in docs}
    want = {}
    for i, (_k, a) in enumerate(order):
        for gap in range(1, SNM_WINDOW + 1):
            if i + gap >= len(order):
                break
            b = order[i + gap][1]
            if sh[a] and sh[b]:
                j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
            else:
                j = None
            want[(a, b)] = (gap, j, j is not None and j >= JACCARD_THRESHOLD)
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["rank_gap"], r["jaccard"], r["is_near_dup"]
        )
        for r in dedup_sorted_neighborhood(spark, sf_dir).collect()
    }
    assert got == want and got
