"""Round-11 additions: IVF-PQ ADC→exact re-rank, audit candidate
counts, and the two-knob (width + band count) near-dup LSH scaling."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_ivfpq_rerank_equals_ivf_when_shortlist_covers(spark, sf001_dir):
    """At driver sf0.01 scale each query has far fewer probed-cell
    candidates than RERANK_K, so the ADC shortlist covers ALL
    candidates and the exact re-rank must reproduce uncompressed IVF's
    (query, cand, rank) sets exactly — the re-rank stage provably
    converges to the exact path as the shortlist deepens."""
    from content_analytics_etl_spark.plans.similarity_queries import (
        RERANK_K,
        sim_ann_ivf_topk,
        sim_ann_ivfpq_topk,
    )

    ivf = {
        (r["query_id"], r["cand_id"], r["rank"])
        for r in sim_ann_ivf_topk(spark, sf001_dir).collect()
    }
    ivfpq_rows = sim_ann_ivfpq_topk(spark, sf001_dir).collect()
    assert ivfpq_rows, "ivfpq must emit rows at sf0.01"
    # precondition: shortlist really does cover every candidate here
    from content_analytics_etl_spark.plans.similarity_queries import (
        _ivfpq_adc_scored,
    )

    max_cand = (
        _ivfpq_adc_scored(spark, sf001_dir)
        .groupBy("query_id")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert max_cand <= RERANK_K
    ivfpq = {(r["query_id"], r["cand_id"], r["rank"]) for r in ivfpq_rows}
    assert ivfpq == ivf


def test_ivfpq_output_carries_both_scores(spark, sf_dir):
    """The re-ranked output exposes adc_d2 (what the compressed index
    thought) AND cosine (the served exact score) — rank follows
    cosine, descending."""
    from content_analytics_etl_spark.plans.similarity_queries import (
        sim_ann_ivfpq_topk,
    )

    df = sim_ann_ivfpq_topk(spark, sf_dir)
    assert {"query_id", "cand_id", "adc_d2", "cosine", "rank"} == set(
        df.columns
    )
    rows = df.collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)


def test_audit_candidate_counts(spark, sf001_dir):
    """n_candidates semantics: pq scores every other vector (N-1);
    ivfpq's candidate cost is the probed-cells ADC relation, identical
    to ivf's; multiprobe's candidates strictly contain single-probe's."""
    from content_analytics_etl_spark.plans.similarity_queries import (
        sim_ann_recall_audit,
    )
    from content_analytics_etl_spark.plans._util import t

    n = t(spark, sf001_dir, "embeddings").count()
    rows = sim_ann_recall_audit(spark, sf001_dir).collect()
    by = {(r["method"], r["query_id"]): r for r in rows}
    queries = {q for (m, q) in by}
    for q in queries:
        assert by[("pq", q)]["n_candidates"] == n - 1
        assert (
            by[("ivfpq", q)]["n_candidates"] == by[("ivf", q)]["n_candidates"]
        )
        assert (
            by[("lsh_mp", q)]["n_candidates"] >= by[("lsh", q)]["n_candidates"]
        )
        # recall is consistent with its parts
        r = by[("ivfpq", q)]
        assert abs(r["recall"] - r["n_hit"] / r["n_true"]) < 1e-12


def test_neardup_multiprobe_candidates_superset_of_exactmatch(spark, sf001_dir):
    """Hamming-≤1 probing can only ADD candidates over the exact-key
    band join — every exact-key collision pair survives (the j = 0
    identity probe), and the verified pair set therefore contains the
    unprobed operating point's."""
    from content_analytics_etl_spark.plans._util import t
    from content_analytics_etl_spark.plans.similarity_queries import (
        DIM,
        ND_MAX_BANDS,
        ND_MAX_BITS,
        _nd_candidates,
        _nd_params_rel,
    )
    from content_analytics_etl_spark.operators.similarity import (
        hyperplane_band_rows,
    )

    emb = t(spark, sf001_dir, "embeddings")
    bands = hyperplane_band_rows(
        emb, _nd_params_rel(emb), ND_MAX_BANDS, ND_MAX_BITS, DIM
    )
    a, b = bands.alias("a"), bands.alias("b")
    exactmatch = {
        (r["vec_a"], r["vec_b"])
        for r in a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .distinct()
        .collect()
    }
    probed = {
        (r["vec_a"], r["vec_b"]) for r in _nd_candidates(emb).collect()
    }
    assert exactmatch < probed, "probing must strictly widen candidates"


def test_neardup_recall_audit_consistency(spark, sf001_dir):
    """The registered audit's counts agree with the relations they
    summarize, and banded-under-cap ⊆ exact-under-cap keeps recall in
    [0, 1]."""
    from content_analytics_etl_spark.plans.similarity_queries import (
        sim_neardup_exact,
        sim_neardup_pairs,
        sim_neardup_recall_audit,
    )

    row = sim_neardup_recall_audit(spark, sf001_dir).collect()[0]
    assert row["n_pairs"] == sim_neardup_pairs(spark, sf001_dir).count()
    assert row["n_exact_cap"] == sim_neardup_exact(spark, sf001_dir).count()
    assert 0 <= row["n_banded_cap"] <= row["n_exact_cap"]
    assert abs(row["recall_cap"] - row["n_banded_cap"] / row["n_exact_cap"]) < 1e-12


def test_decontaminate_fixed_subset_semantics(spark, sf001_dir):
    """With the eval cap above every driver-scale doc_id the fixed twin
    equals the unsuffixed query; its hits are always a subset (smaller
    eval set can only lose hits, and per-doc counts can only shrink)."""
    from content_analytics_etl_spark.plans.dedup_queries import (
        dedup_decontaminate,
        dedup_decontaminate_fixed,
    )

    full = {
        r["doc_id"]: (r["n_eval_hits"], r["max_shared"])
        for r in dedup_decontaminate(spark, sf001_dir).collect()
    }
    fixed = {
        r["doc_id"]: (r["n_eval_hits"], r["max_shared"])
        for r in dedup_decontaminate_fixed(spark, sf001_dir).collect()
    }
    assert fixed, "driver-scale fixed eval set must flag something"
    for doc, (hits, shared) in fixed.items():
        assert doc in full
        assert hits <= full[doc][0]
        assert shared <= full[doc][1]


def test_mink_prob_tail_semantics(spark, sf001_dir):
    """Min-K% invariants: k = max(1, ceil(0.2·n)); the tail mean is
    never above the doc's overall mean log-prob (it averages the
    LOWEST-probability fifth); scores are negative (log2 of p < 1);
    and a Python recomputation from raw text agrees for a sample."""
    import math
    from collections import Counter

    from content_analytics_etl_spark.plans._util import t
    from content_analytics_etl_spark.plans.text_queries import (
        MINK_FRAC,
        doc_lm_perplexity,
        doc_mink_prob,
    )

    rows = doc_mink_prob(spark, sf001_dir).collect()
    assert rows
    ppl = {
        r["doc_id"]: r["cross_entropy_bits"]
        for r in doc_lm_perplexity(spark, sf001_dir).collect()
    }
    for r in rows:
        assert r["k_used"] == max(1, math.ceil(MINK_FRAC * r["n_tokens"]))
        assert r["mink_logprob_bits"] < 0
        # tail mean <= overall mean: -cross_entropy is the overall mean
        assert r["mink_logprob_bits"] <= -ppl[r["doc_id"]] + 1e-9

    # independent recomputation for 5 docs
    docs = {
        d["doc_id"]: d["text"]
        for d in t(spark, sf001_dir, "documents").limit(5).collect()
    }
    all_toks = [
        tok
        for d in t(spark, sf001_dir, "documents").collect()
        for tok in d["text"].lower().split()
        if tok
    ]
    tf = Counter(all_toks)
    n_total, vocab = sum(tf.values()), len(tf)
    norm = round(math.log2(n_total + vocab), 9)
    by_id = {r["doc_id"]: r for r in rows}
    for doc_id, text in docs.items():
        toks = [x for x in text.lower().split() if x]
        if not toks:
            continue
        lps = sorted(round(math.log2(tf[x] + 1), 9) for x in toks)
        k = max(1, math.ceil(MINK_FRAC * len(toks)))
        want = sum(lps[:k]) / k - norm
        assert abs(by_id[doc_id]["mink_logprob_bits"] - want) < 1e-6


def test_range_search_is_verified_subset(spark, sf001_dir):
    """Range-search hits verify the exact threshold (every emitted
    cosine ≥ SEMDECON_COSINE), never include the query side as a
    candidate, and the per-query hit sets are a subset of a brute-force
    recomputation (LSH only prunes; it cannot invent hits)."""
    from content_analytics_etl_spark.functions.vectors import (
        dot_product,
        l2_norm,
    )
    from content_analytics_etl_spark.operators.similarity import (
        to_double_array,
    )
    from content_analytics_etl_spark.plans._util import t
    from content_analytics_etl_spark.plans.similarity_queries import (
        SEMDECON_COSINE,
        _query_side,
        sim_range_search,
    )

    rows = sim_range_search(spark, sf001_dir).collect()
    assert rows, "driver-scale range search must find hits"
    emb = (
        t(spark, sf001_dir, "embeddings")
        .select("vec_id", to_double_array("embedding").alias("v"))
        .withColumn("n", l2_norm(F.col("v")))
    )
    q = emb.filter(_query_side()).collect()
    c = emb.filter(~_query_side()).collect()
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a["v"], b["v"]))
        return d / (a["n"] * b["n"])

    brute = {
        (qq["vec_id"], cc["vec_id"])
        for qq in q
        for cc in c
        if cos(qq, cc) >= SEMDECON_COSINE
    }
    got = {(r["query_id"], r["cand_id"]) for r in rows}
    assert got <= brute
    for r in rows:
        assert r["cosine"] >= SEMDECON_COSINE
        assert (r["cand_id"] % 50 != 0) or (r["cand_id"] >= 1000)
    assert math.isfinite(rows[0]["cosine"])


def test_source_vocab_overlap_invariants(spark, sf001_dir):
    """Set-algebra invariants of the source-pair overlap matrix:
    0 < jaccard <= overlap_coef <= 1, n_shared <= min(v_a, v_b), and a
    Python set recomputation agrees for one pair."""
    from content_analytics_etl_spark.plans._util import t
    from content_analytics_etl_spark.plans.text_queries import (
        corpus_source_vocab_overlap,
    )

    rows = corpus_source_vocab_overlap(spark, sf001_dir).collect()
    assert rows
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert 0 < r["n_shared"] <= min(r["v_a"], r["v_b"])
        assert 0.0 < r["jaccard"] <= r["overlap_coef"] <= 1.0

    r0 = rows[0]
    vocab: dict[str, set] = {}
    for d in t(spark, sf001_dir, "documents").collect():
        toks = {x for x in d["text"].lower().split() if x}
        vocab.setdefault(d["source"], set()).update(toks)
    a, b = vocab[r0["src_a"]], vocab[r0["src_b"]]
    assert r0["n_shared"] == len(a & b)
    assert r0["v_a"] == len(a) and r0["v_b"] == len(b)
    assert abs(r0["jaccard"] - len(a & b) / len(a | b)) < 1e-12


def test_neardup_band_count_grows_planes_only_when_needed(spark):
    """The adaptive band relation emits exactly nb bands per vector —
    ND_NB_FIXED everywhere since the round-11 operating point — and
    never generates planes for bands ≥ nb (the plane-cut contract of
    hyperplane_band_rows)."""
    from content_analytics_etl_spark.operators.similarity import (
        hyperplane_band_rows,
    )
    from content_analytics_etl_spark.plans.similarity_queries import (
        DIM,
        ND_MAX_BANDS,
        ND_MAX_BITS,
        _nd_params_rel,
    )

    emb = (
        spark.range(40)
        .selectExpr(
            "id AS vec_id",
            f"transform(sequence(1, {DIM}), "
            "i -> cast(hash(id, i) % 97 AS double) / 97.0) AS embedding",
        )
    )
    bands = hyperplane_band_rows(
        emb, _nd_params_rel(emb), ND_MAX_BANDS, ND_MAX_BITS, DIM
    )
    from content_analytics_etl_spark.plans.similarity_queries import (
        ND_NB_FIXED,
    )

    per_vec = bands.groupBy("vec_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_vec] == [ND_NB_FIXED]
    idx = sorted(
        r["band_idx"] for r in bands.select("band_idx").distinct().collect()
    )
    assert idx == list(range(ND_NB_FIXED))
