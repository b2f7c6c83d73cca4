"""Invariant tests for the round-4 additions sim_semdedup,
dedup_edit_distance, and corpus_mix_rebalance. Each query already has a
DuckDB oracle; these tests instead pin the DEFINING property against an
independent in-process reimplementation (numpy pairwise cosine, a
pure-Python Wagner-Fischer DP) or against the algebra the result must
satisfy (shares sum to 1, epoch caps bind exactly where they should).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import numpy as np
from pyspark.sql import functions as F

from content_analytics_etl_spark.plans.dedup_queries import (
    EDIT_MAX_DIST,
    EDIT_PREFIX,
    dedup_edit_distance,
)
from content_analytics_etl_spark.plans.similarity_queries import (
    KMEANS_K,
    SEMDEDUP_COSINE,
    sim_semdedup,
)
from content_analytics_etl_spark.plans.text_queries import (
    MIX_MAX_EPOCHS,
    corpus_mix_rebalance,
)

SF = "/root/testdata/sf0.001"


def _norm_texts(spark):
    return {
        r["doc_id"]: r["nt"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            F.trim(
                F.regexp_replace(F.lower("text"), r"\s+", " ")
            ).alias("nt"),
        )
        .collect()
    }


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_semdedup_matches_numpy_reimplementation(spark):
    """Exact dup-set equality vs a from-scratch numpy SemDeDup: same
    fixed centroids (lowest-K ids), nearest-centroid assignment with
    the same tie rule, exhaustive within-cluster pairs, greedy
    keep-lowest-id at the same threshold."""
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    order = np.argsort(ids)
    ids = ids[order]
    V = np.array(
        [rows[i]["embedding"] for i in order], dtype=np.float64
    )
    cent = V[ids < KMEANS_K]
    d2 = ((V[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    cid = d2.argmin(axis=1)  # argmin takes lowest index on ties
    nrm = np.linalg.norm(V, axis=1)
    want_dup_of: dict[int, int] = {}
    for c in range(len(cent)):
        members = ids[cid == c]
        M = V[cid == c]
        n = nrm[cid == c]
        cos = (M @ M.T) / np.outer(n, n)
        for j in range(len(members)):
            earlier = [
                int(members[i])
                for i in range(j)
                if cos[i, j] >= SEMDEDUP_COSINE - 1e-12
            ]
            if earlier:
                want_dup_of[int(members[j])] = min(earlier)

    got = {
        r["vec_id"]: (r["is_dup"], r["dup_of"])
        for r in sim_semdedup(spark, SF).collect()
    }
    assert len(got) == len(ids)
    got_dups = {k: v[1] for k, v in got.items() if v[0]}
    assert got_dups == want_dup_of
    assert want_dup_of, "fixture should contain at least one semantic dup"
    for k, (is_dup, dup_of) in got.items():
        assert is_dup == (dup_of is not None)


def test_edit_distance_pairs_verified_by_python_dp(spark):
    """Every reported pair re-verifies under an independent DP
    Levenshtein, shares the blocking prefix, and every exact duplicate
    (distance 0 between normalized texts) that the blocking key can see
    is reported."""
    texts = _norm_texts(spark)
    out = dedup_edit_distance(spark, SF).collect()
    for r in out:
        a, b = texts[r["doc_a"]], texts[r["doc_b"]]
        assert r["doc_a"] < r["doc_b"]
        assert a[:EDIT_PREFIX] == b[:EDIT_PREFIX]
        d = _levenshtein(a, b)
        assert d == r["dist"] <= EDIT_MAX_DIST
        assert r["len_a"] == len(a) and r["len_b"] == len(b)
        assert math.isclose(
            r["sim"], 1.0 - d / max(len(a), len(b)), rel_tol=1e-12
        )
    reported = {(r["doc_a"], r["doc_b"]) for r in out}
    by_text: dict[str, int] = {}
    for doc_id in sorted(texts):
        nt = texts[doc_id]
        if nt in by_text:
            assert (by_text[nt], doc_id) in reported
        else:
            by_text[nt] = doc_id


def test_mix_rebalance_algebra(spark):
    """Shares sum to 1 on both sides of the rebalance, epochs respect
    the cap and bind exactly when the uncapped weight exceeds it, and
    the expected token budget is n_tokens x epochs."""
    rows = corpus_mix_rebalance(spark, SF).collect()
    assert rows
    cells = len(rows)
    assert math.isclose(sum(r["token_share"] for r in rows), 1.0, rel_tol=1e-9)
    # the rebalanced-total normalizer is fixed-point at milli-token
    # precision (PERF 29), so shares sum to 1 within cells*5e-4/total
    assert math.isclose(
        sum(r["expected_share"] for r in rows), 1.0, rel_tol=1e-5
    )
    for r in rows:
        assert math.isclose(r["target_share"], 1.0 / cells, rel_tol=1e-12)
        assert 0.0 < r["epochs"] <= MIX_MAX_EPOCHS
        raw = r["target_share"] / r["token_share"]
        if raw >= MIX_MAX_EPOCHS:
            assert r["epochs"] == MIX_MAX_EPOCHS
        else:
            assert math.isclose(r["epochs"], raw, rel_tol=1e-12)
        assert math.isclose(
            r["expected_tokens"], r["n_tokens"] * r["epochs"], rel_tol=1e-12
        )


def test_containment_matches_python_sets(spark):
    """Exhaustive recomputation: every same-lang ordered pair whose
    larger-direction containment reaches the threshold is reported with
    the exact count/ratios, and nothing else is."""
    from content_analytics_etl_spark.plans.dedup_queries import (
        CONTAIN_THRESHOLD,
        dedup_containment,
    )

    rows = spark.read.parquet(f"{SF}/documents.parquet").collect()
    sh = {}
    lang = {}
    for r in rows:
        toks = re.sub(r"\s+", " ", r["text"].lower()).strip().split(" ")
        sh[r["doc_id"]] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()
        lang[r["doc_id"]] = r["lang"]
    want = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if lang[a] != lang[b] or not sh[a] or not sh[b]:
                continue
            c = len(sh[a] & sh[b])
            if c == 0:
                continue
            ca, cb = c / len(sh[a]), c / len(sh[b])
            if max(ca, cb) >= CONTAIN_THRESHOLD:
                want[(a, b)] = (c, ca, cb)
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["n_shared"], r["containment_a"], r["containment_b"]
        )
        for r in dedup_containment(spark, SF).collect()
    }
    assert set(got) == set(want)
    for k, (c, ca, cb) in want.items():
        assert got[k][0] == c
        assert math.isclose(got[k][1], ca, rel_tol=1e-12)
        assert math.isclose(got[k][2], cb, rel_tol=1e-12)


def test_markov_transitions_match_python(spark):
    from content_analytics_etl_spark.plans.analytics_queries import (
        events_markov_transitions,
    )

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    seqs = defaultdict(list)
    for r in ev:
        seqs[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    trans = Counter()
    for seq in seqs.values():
        types = [t for _, _, t in sorted(seq)]
        for x, y in zip(types, types[1:]):
            trans[(x, y)] += 1
    from_tot = Counter()
    for (x, _), n in trans.items():
        from_tot[x] += n
    got = {
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["prob"])
        for r in events_markov_transitions(spark, SF).collect()
    }
    assert set(got) == set(trans)
    for k, n in trans.items():
        assert got[k][0] == n
        assert math.isclose(got[k][1], n / from_tot[k[0]], rel_tol=1e-12)
    # rows of each from-state sum to 1
    for x in from_tot:
        s = sum(p for (a, _), (_, p) in got.items() if a == x)
        assert math.isclose(s, 1.0, rel_tol=1e-9)


def test_power_iteration_matches_numpy(spark):
    """Three-step power iteration equals the numpy recurrence from the
    same seed (tolerance-close; numpy reorders the reductions), the
    loadings are unit-norm, and they align with the true dominant
    eigenvector of X^T X."""
    from content_analytics_etl_spark.plans.similarity_queries import (
        PCA_ITERS,
        PCA_SEED,
        embedding_power_iteration,
    )

    X = np.array(
        [
            r["embedding"]
            for r in spark.read.parquet(f"{SF}/embeddings.parquet")
            .orderBy("vec_id")
            .collect()
        ],
        dtype=np.float64,
    )
    v = np.full(X.shape[1], PCA_SEED)
    for _ in range(PCA_ITERS):
        w = X.T @ (X @ v)
        norm = np.linalg.norm(w)
        v = w / norm
    rows = embedding_power_iteration(spark, SF).collect()
    got = np.empty(X.shape[1])
    for r in rows:
        got[r["d"]] = r["loading"]
    sn = rows[0]["spectral_norm"]
    assert all(math.isclose(r["spectral_norm"], sn) for r in rows)
    assert math.isclose(np.linalg.norm(got), 1.0, rel_tol=1e-12)
    # the engine reduction is fixed-point on a 1e-9 grid (PERF 29), so
    # each w_d carries up to rows*5e-10 absolute quantization offset
    assert np.allclose(got, v, rtol=1e-6, atol=1e-6)
    assert math.isclose(sn, norm, rel_tol=1e-6)
    # guaranteed power-iteration properties (this corpus is near-
    # isotropic, so full convergence in 3 rounds is NOT expected):
    # the Rayleigh quotient is non-decreasing from the seed, alignment
    # with the dominant eigenvector never falls, and the spectral
    # estimate is bracketed by the extreme eigenvalues.
    evals, evecs = np.linalg.eigh(X.T @ X)
    top = evecs[:, -1]
    A = X.T @ X
    seed = np.full(X.shape[1], PCA_SEED)
    seed /= np.linalg.norm(seed)
    assert float(got @ A @ got) >= float(seed @ A @ seed)
    assert abs(float(got @ top)) >= abs(float(seed @ top)) - 1e-12
    assert evals[0] - 1e-6 <= sn <= evals[-1] + 1e-6


def test_mmr_matches_python_greedy(spark):
    """The 3 picks per query equal a pure-Python greedy MMR over the
    same top-10 pool (same λ, same tie order), and the diversity
    penalty actually bites somewhere (some pick differs from the pure
    relevance order, or every penalty is zero because pools are
    orthogonal — assert the former when any penalty > 0 exists)."""
    from content_analytics_etl_spark.plans.similarity_queries import (
        MMR_LAMBDA,
        MMR_POOL,
        QUERY_CAP,
        QUERY_MOD,
        sim_mmr_diversify,
    )

    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    ids = [r["vec_id"] for r in rows]
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = V @ V.T
    idx = {v: i for i, v in enumerate(ids)}
    queries = [v for v in ids if v % QUERY_MOD == 0 and v < QUERY_CAP]
    want = {}
    for qv in queries:
        rels = [
            (float(S[idx[qv], idx[c]]), c) for c in ids if c != qv
        ]
        pool = [
            c for _, c in sorted(rels, key=lambda t: (-t[0], t[1]))[:MMR_POOL]
        ]
        rel = {c: float(S[idx[qv], idx[c]]) for c in pool}
        sel = []
        for rank in range(3):
            best = None
            for c in pool:
                if c in sel:
                    continue
                pen = max((float(S[idx[c], idx[s]]) for s in sel), default=0.0)
                score = MMR_LAMBDA * rel[c] - (1 - MMR_LAMBDA) * pen
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c, pen)
            sel.append(best[1])
            want[(qv, rank + 1)] = best[1]
    got = {
        (r["query_id"], r["mmr_rank"]): r["cand_id"]
        for r in sim_mmr_diversify(spark, SF).collect()
    }
    assert got == want and got
