"""Python-recomputed oracles for the round-8 additions: block-level
exact dedup, incremental snapshot dedup, and the vocab coverage curve.
(The DuckDB hash oracle is the primary gate; these pin the SEMANTICS
against an independent pure-python recompute on sf0.001.)"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import duckdb

from content_analytics_etl_spark.plans.dedup_queries import (
    BLOCK_N,
    dedup_block_exact,
    dedup_incremental,
)
from content_analytics_etl_spark.plans.text_queries import (
    VOCAB_CUTOFFS,
    vocab_coverage_curve,
)


def _docs(sf_dir):
    return duckdb.sql(
        f"SELECT doc_id, source, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


def _toks(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.lower()).strip().split(" ")


def test_dedup_block_exact_matches_python(spark, sf_dir):
    first: dict[str, tuple[int, int]] = {}
    per_doc: dict[int, list[str]] = {}
    for doc_id, _src, text in _docs(sf_dir):
        toks = _toks(text)
        fps = []
        for b in range(len(toks) // BLOCK_N):
            blk = " ".join(toks[b * BLOCK_N : (b + 1) * BLOCK_N])
            fp = hashlib.md5(blk.encode()).hexdigest()
            fps.append(fp)
            first.setdefault(fp, (doc_id, b))
        if fps:
            per_doc[doc_id] = fps
    want = {
        doc_id: (
            len(fps),
            sum(1 for b, fp in enumerate(fps) if first[fp] != (doc_id, b)),
        )
        for doc_id, fps in per_doc.items()
    }
    got = {
        r["doc_id"]: (r["n_blocks"], r["n_dup_blocks"])
        for r in dedup_block_exact(spark, sf_dir).collect()
    }
    assert got == want
    assert any(v[1] > 0 for v in want.values()), (
        "fixture corpus should contain duplicated blocks (planted dups)"
    )


def test_dedup_incremental_matches_python(spark, sf_dir):
    base_fps: set[str] = set()
    batch: list[tuple[int, str, str]] = []
    for doc_id, src, text in _docs(sf_dir):
        fp = hashlib.md5(" ".join(_toks(text)).encode()).hexdigest()
        if doc_id % 4 == 3:
            batch.append((doc_id, src, fp))
        else:
            base_fps.add(fp)
    seen: set[str] = set()
    want: Counter = Counter()
    for doc_id, src, fp in sorted(batch):
        if fp in base_fps:
            status = "dup_of_base"
        elif fp in seen:
            status = "dup_in_batch"
        else:
            status = "new"
        seen.add(fp)
        want[(src, status)] += 1
    got = {
        (r["source"], r["status"]): r["n_docs"]
        for r in dedup_incremental(spark, sf_dir).collect()
    }
    assert got == dict(want)
    assert sum(want.values()) == len(batch)


def test_vocab_coverage_curve_matches_python(spark, sf_dir):
    cnt: Counter = Counter()
    for _doc_id, _src, text in _docs(sf_dir):
        toks = _toks(text)
        for i in range(len(toks) - 1):
            cnt[toks[i] + " " + toks[i + 1]] += 1
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())
    want = {}
    for k in VOCAB_CUTOFFS:
        top = ranked[:k]
        covered = sum(n for _, n in top)
        want[k] = (len(top), covered, total, covered / total)
    got = {
        r["cutoff"]: (
            r["n_types"],
            r["covered_occurrences"],
            r["total_occurrences"],
            r["coverage"],
        )
        for r in vocab_coverage_curve(spark, sf_dir).collect()
    }
    assert got == want
    # the curve is monotone non-decreasing in K
    covs = [want[k][3] for k in VOCAB_CUTOFFS]
    assert covs == sorted(covs)
