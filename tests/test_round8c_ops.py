"""Python-recomputed oracles for the round-8 third batch: RRF hybrid
fusion and the dimension-truncation recall audit. (The DuckDB hash
oracle is the primary gate; these pin the SEMANTICS against an
independent pure-python recompute on sf0.001.)"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import duckdb

from content_analytics_etl_spark.plans.similarity_queries import (
    QUERY_CAP,
    QUERY_MOD,
    TOPK,
    TRUNC_DIMS,
    sim_dim_truncation_recall,
)
from content_analytics_etl_spark.plans.text_queries import (
    _BM25_K1B,
    _BM25_K1_1MB,
    _BM25_NUM,
    BM25_TERMS,
    RRF_K,
    RRF_POOL,
    RRF_TOP,
    doc_rrf_fusion,
)


def _toks(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.lower()).strip().split(" ")


def test_doc_rrf_fusion_matches_python(spark, sf_dir):
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
    bm_fp: dict[int, int] = defaultdict(int)
    ti_fp: dict[int, int] = defaultdict(int)
    for (d, term), f in tf.items():
        bm_idf = round(
            math.log(
                (float(n_docs) - float(df[term]) + 0.5)
                / (float(df[term]) + 0.5)
                + 1.0
            ),
            9,
        )
        bm = bm_idf * (
            (float(f) * _BM25_NUM)
            / (float(f) + (_BM25_K1_1MB + (_BM25_K1B * float(dl[d])) / avgdl))
        )
        ti = float(f) * round(math.log(float(n_docs) / float(df[term])), 9)
        bm_fp[d] += math.floor(bm * 1e9 + 0.5)
        ti_fp[d] += math.floor(ti * 1e9 + 0.5)

    def pool(score_fp: dict[int, int]) -> dict[int, int]:
        ranked = sorted(
            ((float(fp) / 1e9, d) for d, fp in score_fp.items()),
            key=lambda t: (-t[0], t[1]),
        )[:RRF_POOL]
        return {d: rk + 1 for rk, (_s, d) in enumerate(ranked)}

    bm_rank, ti_rank = pool(bm_fp), pool(ti_fp)
    fused = {}
    for d in set(bm_rank) | set(ti_rank):
        rrf = (1.0 / float(RRF_K + bm_rank[d]) if d in bm_rank else 0.0) + (
            1.0 / float(RRF_K + ti_rank[d]) if d in ti_rank else 0.0
        )
        fused[d] = (bm_rank.get(d, 0), ti_rank.get(d, 0), rrf)
    top = sorted(fused.items(), key=lambda t: (-t[1][2], t[0]))[:RRF_TOP]
    want = {d: (*v, rk + 1) for rk, (d, v) in enumerate(top)}
    got = {
        r["doc_id"]: (
            r["bm25_rank"],
            r["tfidf_rank"],
            r["rrf_score"],
            r["rank"],
        )
        for r in doc_rrf_fusion(spark, sf_dir).collect()
    }
    assert got == want
    # non-vacuity: the rankers must genuinely DISAGREE somewhere in the
    # fused top (otherwise RRF is an identity test of one ranker)
    assert any(b != t_ for (b, t_, _s, _r) in want.values()), (
        "vacuous fusion — BM25 and TF-IDF produced identical rankings"
    )


def test_sim_dim_truncation_recall_matches_python(spark, sf_dir):
    vecs = dict(
        duckdb.sql(
            f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
            " ORDER BY 1"
        ).fetchall()
    )
    queries = [v for v in vecs if v % QUERY_MOD == 0 and v < QUERY_CAP]

    def _fold(xs) -> float:
        # sequential left fold — bit-identical to the engine's
        # F.aggregate accumulation (fsum would differ in the last ulp)
        acc = 0.0
        for x in xs:
            acc += x
        return acc

    def topk(dims: int, qid: int) -> list[int]:
        qv = [float(x) for x in vecs[qid][:dims]]
        qn = math.sqrt(_fold(x * x for x in qv))
        scored = []
        for cid, cv in vecs.items():
            if cid == qid:
                continue
            cv = [float(x) for x in cv[:dims]]
            cn = math.sqrt(_fold(x * x for x in cv))
            dot = _fold(a * b for a, b in zip(qv, cv))
            scored.append((dot / (qn * cn), cid))
        scored.sort(key=lambda t: (-t[0], t[1]))
        return [cid for _s, cid in scored[:TOPK]]

    full_dim = len(next(iter(vecs.values())))
    want = {}
    for qid in queries:
        truth = set(topk(full_dim, qid))
        for dims in TRUNC_DIMS:
            hit = len(truth & set(topk(dims, qid)))
            want[(dims, qid)] = (
                len(truth),
                hit,
                float(hit) / float(len(truth)),
            )
    got = {
        (r["dims"], r["query_id"]): (r["n_true"], r["n_hit"], r["recall"])
        for r in sim_dim_truncation_recall(spark, sf_dir).collect()
    }
    assert got == want
    # non-vacuity: wider prefixes must not be uniformly perfect AND some
    # truncation must recover something, or the audit measures nothing
    assert any(v[1] < v[0] for v in want.values()), (
        "vacuous audit — every truncation has perfect recall"
    )
    assert any(v[1] > 0 for v in want.values()), (
        "vacuous audit — no truncation recovers any true neighbor"
    )


def test_graph_label_propagation_matches_python(spark, sf_dir):
    from content_analytics_etl_spark.plans.graph_queries import (
        LPA_ITERS,
        LPA_MIN_W,
        graph_label_propagation,
    )

    rows = duckdb.sql(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    by_order: dict[int, list[int]] = defaultdict(list)
    for okey, pkey in rows:
        by_order[okey].append(pkey)
    wts: Counter = Counter()
    for parts in by_order.values():
        ps = sorted(set(parts))
        for i, u in enumerate(ps):
            for v in ps[i + 1:]:
                wts[(u, v)] += 1
    nbrs: dict[int, dict] = defaultdict(dict)
    for (u, v), w in wts.items():
        if w >= LPA_MIN_W:
            nbrs[u][v] = w
            nbrs[v][u] = w
    labels = {n: n for n in nbrs}
    for _ in range(LPA_ITERS):
        new = {}
        for n in nbrs:
            votes: Counter = Counter()
            for m, w in nbrs[n].items():
                votes[labels[m]] += w
            votes[labels[n]] += 1  # self-vote
            new[n] = min(
                votes, key=lambda lab: (-votes[lab], lab)
            )
        labels = new
    sizes: Counter = Counter(labels.values())
    want = {n: (lab, sizes[lab]) for n, lab in labels.items()}
    got = {
        r["node"]: (r["community"], r["n_members"])
        for r in graph_label_propagation(spark, sf_dir).collect()
    }
    assert got == want
    # non-vacuity: real community structure — more than one community,
    # and at least one community larger than a single node
    assert len(sizes) > 1 and max(sizes.values()) > 1
