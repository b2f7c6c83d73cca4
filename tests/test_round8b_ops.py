"""Python-recomputed oracles for the round-8 second batch: BM25 search,
winsorized length stats, and the per-source dedup-rate scorecard.
(The DuckDB hash oracle is the primary gate; these pin the SEMANTICS
against an independent pure-python recompute on sf0.001.)"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import duckdb

from content_analytics_etl_spark.plans.dedup_queries import (
    corpus_dedup_rate_by_source,
)
from content_analytics_etl_spark.plans.text_queries import (
    _BM25_K1B,
    _BM25_K1_1MB,
    _BM25_NUM,
    BM25_TERMS,
    BM25_TOP,
    WINSOR_HI,
    WINSOR_LO,
    doc_bm25_search,
    doc_length_winsorized,
)


def _toks(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.lower()).strip().split(" ")


def test_doc_bm25_search_matches_python(spark, sf_dir):
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY 1"
    ).fetchall()
    dl: dict[int, int] = {}
    tf: Counter = Counter()
    for doc_id, text in docs:
        toks = _toks(text)
        dl[doc_id] = len(toks)
        for tk in toks:
            if tk in BM25_TERMS:
                tf[(doc_id, tk)] += 1
    n_docs = len(dl)
    avgdl = float(sum(dl.values())) / float(n_docs)
    df: Counter = Counter(term for (_d, term) in tf)
    matched: dict[int, int] = defaultdict(int)
    score_fp: dict[int, int] = defaultdict(int)
    for (d, term), f in tf.items():
        idf = round(
            math.log(
                (float(n_docs) - float(df[term]) + 0.5)
                / (float(df[term]) + 0.5)
                + 1.0
            ),
            9,
        )
        s = idf * (
            (float(f) * _BM25_NUM)
            / (float(f) + (_BM25_K1_1MB + (_BM25_K1B * float(dl[d])) / avgdl))
        )
        matched[d] += 1
        score_fp[d] += math.floor(s * 1e9 + 0.5)
    ranked = sorted(
        ((float(fp) / 1e9, d) for d, fp in score_fp.items()),
        key=lambda t: (-t[0], t[1]),
    )[:BM25_TOP]
    want = {
        d: (matched[d], sc, rk + 1) for rk, (sc, d) in enumerate(ranked)
    }
    got = {
        r["doc_id"]: (r["n_terms_matched"], r["bm25_score"], r["rank"])
        for r in doc_bm25_search(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) == BM25_TOP and all(v[1] > 0 for v in got.values()), (
        "vacuous BM25 result — query terms missing from the corpus"
    )


def test_doc_length_winsorized_matches_python(spark, sf_dir):
    docs = duckdb.sql(
        f"SELECT doc_id, source, n_chars FROM '{sf_dir}/documents.parquet'"
        " ORDER BY source, n_chars, doc_id"
    ).fetchall()
    per_src: dict[str, list[int]] = defaultdict(list)
    for _doc_id, src, n_chars in docs:
        per_src[src].append(n_chars)

    def interp(vals: list[int], p: float) -> float:
        k = p * float(len(vals) - 1)
        lo, hi = math.floor(k), math.ceil(k)
        frac = k - math.floor(k)
        return float(vals[lo]) + (float(vals[hi]) - float(vals[lo])) * frac

    want = {}
    for src, vals in per_src.items():
        p05 = interp(vals, WINSOR_LO)
        p95 = interp(vals, WINSOR_HI)
        s_fp = sum(
            math.floor(max(p05, min(p95, float(v))) * 1e6 + 0.5) for v in vals
        )
        want[src] = (
            len(vals),
            p05,
            p95,
            (float(s_fp) / 1e6) / float(len(vals)),
            sum(1 for v in vals if float(v) < p05),
            sum(1 for v in vals if float(v) > p95),
        )
    got = {
        r["source"]: (
            r["n_docs"],
            r["p05_chars"],
            r["p95_chars"],
            r["winsorized_mean_chars"],
            r["n_clamped_low"],
            r["n_clamped_high"],
        )
        for r in doc_length_winsorized(spark, sf_dir).collect()
    }
    assert got == want
    assert any(v[4] > 0 or v[5] > 0 for v in want.values()), (
        "vacuous winsorization — nothing outside the percentile band"
    )


def test_corpus_dedup_rate_by_source_matches_python(spark, sf_dir):
    docs = duckdb.sql(
        f"SELECT doc_id, source, text FROM '{sf_dir}/documents.parquet'"
        " ORDER BY 1"
    ).fetchall()
    per_sf: Counter = Counter()
    for _doc_id, src, text in docs:
        fp = hashlib.md5(" ".join(_toks(text)).encode()).hexdigest()
        per_sf[(src, fp)] += 1
    copies: Counter = Counter()
    sources: dict[str, set] = defaultdict(set)
    for (src, fp), n in per_sf.items():
        copies[fp] += n
        sources[fp].add(src)
    want = {}
    for src in {s for (s, _f) in per_sf}:
        items = [(fp, n) for (s, fp), n in per_sf.items() if s == src]
        n_docs = sum(n for _f, n in items)
        dup = sum(n for fp, n in items if copies[fp] > 1)
        cross = sum(n for fp, n in items if len(sources[fp]) > 1)
        want[src] = (
            n_docs,
            len(items),
            dup,
            cross,
            float(dup) / float(n_docs),
        )
    got = {
        r["source"]: (
            r["n_docs"],
            r["n_unique_fps"],
            r["n_dup_docs"],
            r["n_cross_source_dup_docs"],
            r["dup_rate"],
        )
        for r in corpus_dedup_rate_by_source(spark, sf_dir).collect()
    }
    assert got == want


def test_corpus_dedup_rate_nonvacuous_on_seeded_corpus(spark, tmp_path):
    """The generated corpus is not guaranteed to contain EXACT
    duplicates at sf0.001 (the 2026-08-15 regeneration has none), so
    the non-vacuity leg runs on a seeded corpus with known dup
    structure: two within-source copies, one cross-source copy, one
    unique doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (1, "alpha beta gamma", "en", "web"),
        (2, "alpha  beta gamma", "en", "web"),  # ws-normalized dup of 1
        (3, "alpha beta gamma", "en", "books"),  # cross-source dup
        (4, "delta epsilon", "en", "web"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": [r[1] for r in rows],
                "lang": [r[2] for r in rows],
                "source": [r[3] for r in rows],
                "n_chars": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = {
        r["source"]: r
        for r in corpus_dedup_rate_by_source(spark, str(tmp_path)).collect()
    }
    web, books = got["web"], got["books"]
    assert (web["n_docs"], web["n_unique_fps"]) == (3, 2)
    assert (web["n_dup_docs"], web["n_cross_source_dup_docs"]) == (2, 2)
    assert web["dup_rate"] == 2.0 / 3.0
    assert (books["n_dup_docs"], books["n_cross_source_dup_docs"]) == (1, 1)
