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


def test_systematic_sample_matches_python(spark, sf_dir):
    """Madow systematic PPS recomputed in pure python: cumulative char
    line in (source, doc_id) order, integer midpoint pick positions,
    exactly K picks, multiplicity proportional to weight."""
    from content_analytics_etl_spark.plans.curation_queries import (
        SYS_SAMPLE_K,
        corpus_systematic_sample,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, source, n_chars FROM '{sf_dir}/documents.parquet'"
        " ORDER BY source, doc_id"
    ).fetchall()
    total = sum(w for _d, _s, w in docs)
    points = [((2 * i + 1) * total) // (2 * SYS_SAMPLE_K)
              for i in range(SYS_SAMPLE_K)]
    want, cum, di = {}, 0, 0
    for i, p in enumerate(points):
        while not (cum <= p < cum + docs[di][2]):
            cum += docs[di][2]
            di += 1
        want[i] = (p, docs[di][0], docs[di][1], docs[di][2])
    got = {
        r["pick_idx"]: (
            r["point"], r["doc_id"], r["source"], r["weight_chars"]
        )
        for r in corpus_systematic_sample(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) == SYS_SAMPLE_K
    # PPS property: some doc must be picked more than once iff any
    # weight exceeds the stride (true on this corpus)
    stride = total / SYS_SAMPLE_K
    if max(w for _d, _s, w in docs) > stride:
        picked = [v[1] for v in want.values()]
        assert len(set(picked)) < len(picked)


def test_duplicated_spans_matches_python(spark, sf_dir):
    """Lee-et-al span coverage recomputed in pure python: stride-grid
    64-char windows, cross-doc shared (>= 2 distinct docs), per-doc
    interval union. Adjacent windows (gap 0) must merge into one span."""
    from content_analytics_etl_spark.plans.dedup_queries import (
        SPAN_LEN,
        SPAN_STRIDE,
        doc_duplicated_spans,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY 1"
    ).fetchall()
    wins: dict[int, list] = {}
    owners: dict[str, set] = {}
    norm = {}
    for did, tx in docs:
        nt = _norm(tx)
        norm[did] = nt
        ws = []
        for s in range(0, len(nt) - SPAN_LEN + 1, SPAN_STRIDE):
            w = nt[s : s + SPAN_LEN]
            ws.append((s, w))
            owners.setdefault(w, set()).add(did)
        wins[did] = ws
    want = {}
    for did, ws in wins.items():
        shared = [(s, w) for s, w in ws if len(owners[w]) >= 2]
        spans, covered = 0, 0
        cur_s = cur_e = None
        for s, _w in shared:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                    spans += 1
                cur_s, cur_e = s, s + SPAN_LEN
            else:
                cur_e = max(cur_e, s + SPAN_LEN)
        if cur_e is not None:
            covered += cur_e - cur_s
            spans += 1
        n = len(norm[did])
        want[did] = (
            n,
            len(ws),
            len(shared),
            spans,
            covered,
            covered / n if n > 0 else None,
        )
    got = {
        r["doc_id"]: (
            r["n_chars_norm"],
            r["n_windows"],
            r["n_shared_windows"],
            r["n_spans"],
            r["covered_chars"],
            r["dup_char_fraction"],
        )
        for r in doc_duplicated_spans(spark, sf_dir).collect()
    }
    assert got == want and got


def test_kneser_ney_matches_python(spark, sf_dir):
    """Interpolated KN bigram perplexity recomputed in pure python with
    the same 9 dp log2 grid and fixed-point reduction; also pins the
    smoothing property p > (c-D)/c_prefix (interpolation only ADDS
    mass) and that KN != add-one on this corpus."""
    import math

    from content_analytics_etl_spark.plans.text_queries import (
        KN_DISCOUNT,
        doc_kneser_ney_perplexity,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY 1"
    ).fetchall()
    from collections import Counter

    x: Counter = Counter()
    for did, tx in docs:
        tk = _norm(tx).split(" ")
        for i in range(len(tk) - 1):
            x[(did, tk[i], tk[i + 1])] += 1
    cb: Counter = Counter()
    for (did, w1, w2), n in x.items():
        cb[(w1, w2)] += n
    cp: Counter = Counter()
    n1p: Counter = Counter()
    n1c: Counter = Counter()
    for (w1, w2), n in cb.items():
        cp[w1] += n
        n1p[w1] += 1
        n1c[w2] += 1
    npp = len(cb)
    per: dict = {}
    for (did, w1, w2), n in x.items():
        p = (cb[(w1, w2)] - KN_DISCOUNT) / cp[w1] + (
            KN_DISCOUNT * n1p[w1] / cp[w1] * n1c[w2] / npp
        )
        assert p > (cb[(w1, w2)] - KN_DISCOUNT) / cp[w1]
        sb, cnt = per.get(did, (0, 0))
        per[did] = (
            sb + math.floor(n * round(math.log2(p), 9) * 1e9 + 0.5),
            cnt + n,
        )
    want = {}
    for did, _tx in docs:
        if did in per:
            sb, n = per[did]
            ce = -sb / 1e9 / n
            want[did] = (n, ce, round(2.0**ce, 6))
        else:
            want[did] = (0, 0.0, 1.0)
    got = {
        r["doc_id"]: (
            r["n_bigrams"], r["cross_entropy_bits"], r["perplexity"]
        )
        for r in doc_kneser_ney_perplexity(spark, sf_dir).collect()
    }
    assert got == want and got


def test_sparse_cosine_topk_matches_python(spark, sf_dir):
    """Inverted-index TF-IDF cosine recomputed in pure python with the
    same fractional DF cut, 9 dp idf grid and fixed-point reductions;
    pins the subspace semantics (norms include df=1 terms, pairs only
    through df>=2 index terms) and top-k tie order."""
    import math
    from collections import Counter, defaultdict

    from content_analytics_etl_spark.plans.text_queries import (
        SPARSE_DF_ABS,
        SPARSE_DF_DEN,
        SPARSE_TOPK,
        doc_sparse_cosine_topk,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY 1"
    ).fetchall()
    n_docs = len(docs)
    tf: Counter = Counter()
    for did, tx in docs:
        for tk in _norm(tx).split(" "):
            tf[(did, tk)] += 1
    df: Counter = Counter(term for (_d, term) in tf)
    keep = {
        term
        for term, c in df.items()
        if c * SPARSE_DF_DEN <= n_docs and c <= SPARSE_DF_ABS
    }
    w = {
        (did, term): cnt * round(math.log(n_docs / df[term]), 9)
        for (did, term), cnt in tf.items()
        if term in keep
    }
    norm_fp: Counter = Counter()
    post = defaultdict(list)
    for (did, term), wv in w.items():
        norm_fp[did] += math.floor(wv * wv * 1e9 + 0.5)
        if df[term] >= 2:
            post[term].append((did, wv))
    norm = {did: math.sqrt(fp / 1e9) for did, fp in norm_fp.items()}
    dots: Counter = Counter()
    for term, plist in post.items():
        for da, wa in plist:
            for db, wb in plist:
                if da != db:
                    dots[(da, db)] += math.floor(wa * wb * 1e9 + 0.5)
    cand = defaultdict(list)
    for (da, db), fp in dots.items():
        cand[da].append(((fp / 1e9) / (norm[da] * norm[db]), db))
    want = {}
    for da, lst in cand.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        for r, (c, db) in enumerate(lst[:SPARSE_TOPK], 1):
            want[(da, db)] = (c, r)
    got = {
        (r["doc_id"], r["neighbor_id"]): (r["cosine"], r["rank"])
        for r in doc_sparse_cosine_topk(spark, sf_dir).collect()
    }
    assert got == want and got


def test_negative_samples_matches_python(spark, sf_dir):
    """Seeded hash negative sampling recomputed in pure python: dense
    node numbering, md5-hash proposals mod N, self/edge rejection,
    earliest-proposal dedup, keep-3. Pins that NO emitted pair is a
    real co-purchase edge."""
    import hashlib as _hl
    from collections import defaultdict

    from content_analytics_etl_spark.plans.graph_queries import (
        LPA_MIN_W,
        NEG_KEEP,
        NEG_PROPOSALS,
        NEG_SEED,
        graph_negative_samples,
    )

    edges = duckdb.sql(
        f"""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM '{sf_dir}/lineitem.parquet')
        SELECT a.l_partkey u, b.l_partkey v
        FROM op a JOIN op b USING (l_orderkey)
        WHERE a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(1) >= {LPA_MIN_W}
        """
    ).fetchall()
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    nodes = sorted(adj)
    rn = {n: i for i, n in enumerate(nodes)}
    n_nodes = len(nodes)

    def h64(s: str) -> int:
        return int(_hl.md5(s.encode()).hexdigest()[:15], 16)

    want = {}
    for u in nodes:
        seen, kept = set(), 0
        for j in range(NEG_PROPOSALS):
            tgt = nodes[h64(f"{NEG_SEED}|{u}|{j}") % n_nodes]
            if tgt == u or tgt in adj[u] or tgt in seen:
                continue
            seen.add(tgt)
        for r, (j, tgt) in enumerate(
            sorted(
                (
                    min(
                        j
                        for j in range(NEG_PROPOSALS)
                        if nodes[h64(f"{NEG_SEED}|{u}|{j}") % n_nodes] == t
                    ),
                    t,
                )
                for t in seen
            ),
            1,
        ):
            if r <= NEG_KEEP:
                want[(u, tgt)] = (j, r)
            kept += 1
    got = {
        (r["node"], r["neg_id"]): (r["proposal_idx"], r["keep_rank"])
        for r in graph_negative_samples(spark, sf_dir).collect()
    }
    assert got == want and got
    for (u, v), _jr in got.items():
        assert v not in adj[u], "emitted a real edge as a negative"


def test_band_tuning_candidate_nesting(spark, sf_dir):
    """With ALIGNED banding over the same 16 perms (band b of r rows =
    perms [b*r, b*r+r)), agreement on a 4-perm band implies agreement
    on both of its 2-perm halves — so the candidate sets NEST:
    cand(2x8) ⊆ cand(4x4) ⊆ cand(8x2), and recall is monotone
    non-decreasing in the band count. The report must reflect both."""
    from content_analytics_etl_spark.operators.dedup import (
        lsh_band_keys,
        minhash_signature_agg,
        shingle_hashes,
        shingle_rows,
    )
    from content_analytics_etl_spark.plans._util import t
    from content_analytics_etl_spark.plans.dedup_queries import (
        LSH_TUNE_CONFIGS,
        dedup_minhash_band_tuning,
    )
    from pyspark.sql import functions as F

    d = t(spark, sf_dir, "documents")
    sig = minhash_signature_agg(
        shingle_hashes(shingle_rows(d, ["doc_id"], distinct=False), ["doc_id"]),
        ["doc_id"],
        k=16,
    ).persist()
    cand = {}
    for b, r in LSH_TUNE_CONFIGS:
        bands = lsh_band_keys(sig, ["doc_id"], bands=b, rows=r)
        ba, bb = bands.alias("ba"), bands.alias("bb")
        cand[(b, r)] = {
            (row["doc_a"], row["doc_b"])
            for row in ba.join(
                bb,
                (F.col("ba.band_idx") == F.col("bb.band_idx"))
                & (F.col("ba.band_key") == F.col("bb.band_key"))
                & (F.col("ba.doc_id") < F.col("bb.doc_id")),
            )
            .select(
                F.col("ba.doc_id").alias("doc_a"),
                F.col("bb.doc_id").alias("doc_b"),
            )
            .distinct()
            .collect()
        }
    sig.unpersist()
    assert cand[(2, 8)] <= cand[(4, 4)] <= cand[(8, 2)]
    rep = {
        (r["bands"], r["rows_per_band"]): r
        for r in dedup_minhash_band_tuning(spark, sf_dir).collect()
    }
    assert [rep[c]["n_candidates"] for c in LSH_TUNE_CONFIGS] == [
        len(cand[c]) for c in LSH_TUNE_CONFIGS
    ]
    recalls = [rep[c]["recall"] for c in LSH_TUNE_CONFIGS]
    assert recalls == sorted(recalls), "recall must be monotone in bands"


def test_domain_surprisal_matches_python(spark, sf_dir):
    """Dual-LM surprisal gap recomputed in pure python with the same
    9 dp grid and fixed-point reductions; pins that the gap is exactly
    ce_global - ce_source and zero for empty docs."""
    import math
    from collections import Counter

    from content_analytics_etl_spark.plans.selection_queries import (
        doc_domain_surprisal,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, source, text FROM '{sf_dir}/documents.parquet'"
        " ORDER BY 1"
    ).fetchall()
    x: Counter = Counter()
    cg: Counter = Counter()
    cs: Counter = Counter()
    ns: Counter = Counter()
    vs: dict = {}
    ng = 0
    vg: set = set()
    for did, src, tx in docs:
        for tk in _norm(tx).split(" "):
            x[(did, src, tk)] += 1
            cg[tk] += 1
            cs[(src, tk)] += 1
            ns[src] += 1
            vs.setdefault(src, set()).add(tk)
            ng += 1
            vg.add(tk)
    per: dict = {}
    for (did, src, tk), n in x.items():
        dg = round(math.log2(cg[tk] + 1), 9) - round(
            math.log2(ng + len(vg)), 9
        )
        ds = round(math.log2(cs[(src, tk)] + 1), 9) - round(
            math.log2(ns[src] + len(vs[src])), 9
        )
        sg, ss, cnt = per.get(did, (0, 0, 0))
        per[did] = (
            sg + math.floor(n * dg * 1e9 + 0.5),
            ss + math.floor(n * ds * 1e9 + 0.5),
            cnt + n,
        )
    want = {}
    for did, src, _tx in docs:
        if did in per:
            sg, ss, n = per[did]
            ceg, ces = -sg / 1e9 / n, -ss / 1e9 / n
            want[did] = (src, n, ceg, ces, ceg - ces)
        else:
            want[did] = (src, 0, 0.0, 0.0, 0.0)
    got = {
        r["doc_id"]: (
            r["source"],
            r["n_tokens"],
            r["ce_global_bits"],
            r["ce_source_bits"],
            r["domain_surprisal_gap"],
        )
        for r in doc_domain_surprisal(spark, sf_dir).collect()
    }
    assert got == want and got
