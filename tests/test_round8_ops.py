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


def test_events_key_skew_profile_matches_python(spark, sf_dir):
    import math

    from content_analytics_etl_spark.plans.events_queries import (
        events_key_skew_profile,
    )

    counts = Counter(
        r[0]
        for r in duckdb.sql(
            f"SELECT user_id FROM '{sf_dir}/events.parquet'"
        ).fetchall()
    )
    xs = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(xs)
    tot = sum(c for _, c in xs)
    a = sum((i + 1) * c for i, (_, c) in enumerate(xs))
    gini = (2 * a - (n + 1) * tot) / (n * tot)
    pct = {p: xs[math.ceil(p * n) - 1][1] for p in (0.5, 0.9, 0.99)}
    row = events_key_skew_profile(spark, sf_dir).collect()[0]
    assert row["n_keys"] == n
    assert row["total_rows"] == tot
    assert row["max_cnt"] == xs[-1][1]
    assert (row["p50_cnt"], row["p90_cnt"], row["p99_cnt"]) == (
        pct[0.5],
        pct[0.9],
        pct[0.99],
    )
    assert row["top1_share"] == xs[-1][1] / tot
    assert row["gini"] == gini
    assert 0.0 <= row["gini"] < 1.0


def test_doc_blocklist_filter_matches_python(spark, sf_dir):
    from content_analytics_etl_spark.plans.text_queries import (
        BLOCK_RATIO_MAX,
        BLOCKLIST,
        doc_blocklist_filter,
    )

    want = {}
    for doc_id, _src, text in _docs(sf_dir):
        toks = _toks(text)
        hits = sum(1 for x in toks if x in BLOCKLIST)
        ratio = hits / len(toks)
        want[doc_id] = (len(toks), hits, ratio, hits == 0, ratio < BLOCK_RATIO_MAX)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_blocked"],
            r["blocked_ratio"],
            r["keep_strict"],
            r["keep_soft"],
        )
        for r in doc_blocklist_filter(spark, sf_dir).collect()
    }
    assert got == want
    # the gates must actually discriminate on the fixture corpus
    assert any(not v[3] for v in want.values())
    assert any(v[3] for v in want.values())


def test_corpus_epoch_shuffle_matches_python_and_balances(spark, sf_dir):
    from content_analytics_etl_spark.plans.curation_queries import (
        SHUFFLE_SEED,
        SHUFFLE_SHARDS,
        corpus_epoch_shuffle,
    )

    def key(doc_id: int) -> int:
        h = hashlib.md5(f"{SHUFFLE_SEED}|{doc_id}".encode()).hexdigest()
        return int(h[:15], 16)

    ids = [doc_id for doc_id, _s, _t in _docs(sf_dir)]
    shards: dict[int, list[tuple[int, int]]] = {}
    for doc_id in ids:
        k = key(doc_id)
        shards.setdefault(k % SHUFFLE_SHARDS, []).append((k, doc_id))
    want = {}
    for sh, members in shards.items():
        for pos, (k, doc_id) in enumerate(sorted(members), start=1):
            want[doc_id] = (sh, k, pos)
    got = {
        r["doc_id"]: (r["shard"], r["shuffle_key"], r["pos"])
        for r in corpus_epoch_shuffle(spark, sf_dir).collect()
    }
    assert got == want
    # seeded md5 keys spread the fixture corpus over every shard
    sizes = [len(m) for m in shards.values()]
    assert len(sizes) == SHUFFLE_SHARDS
    assert max(sizes) <= 3 * min(sizes)


def test_quantile_sketch_brackets_true_percentile(spark, sf_dir):
    """The merged-sketch inversion must bracket the exact (python)
    percentile within its bin bounds, and the reported masses must be
    exact — the mergeability guarantee the 100 TB path relies on."""
    from content_analytics_etl_spark.plans.events_queries import (
        QSKETCH_QS,
        events_quantile_sketch_rollup,
    )

    vals = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT value FROM '{sf_dir}/events.parquet'"
        ).fetchall()
    )
    n = len(vals)
    rows = {
        r["q"]: r for r in events_quantile_sketch_rollup(spark, sf_dir).collect()
    }
    assert set(rows) == set(QSKETCH_QS)
    import math

    for q, r in rows.items():
        true_pq = vals[math.ceil(q * n) - 1]  # lower exact q-quantile
        assert r["est_lo"] <= true_pq < r["est_hi"]
        assert r["total_rows"] == n
        assert r["n_at_or_below"] == sum(1 for v in vals if v < r["est_hi"])


def test_dedup_lsh_incremental_consistent_with_full_lsh(spark, sf_dir):
    """The incremental classification must agree with the full LSH pair
    list: a batch doc is neardup_of_base iff the full dedup_minhash_lsh
    output pairs it with a base doc, neardup_in_batch iff its only
    verified partners are SMALLER-id batch docs (first copy stays new)."""
    from collections import Counter

    from content_analytics_etl_spark.plans.dedup_queries import (
        dedup_lsh_incremental,
        dedup_minhash_lsh,
    )

    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
    ]
    docs = duckdb.sql(
        f"SELECT doc_id, source FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    partners: dict[int, set[int]] = {}
    for a, b in pairs:
        partners.setdefault(a, set()).add(b)
        partners.setdefault(b, set()).add(a)
    want: Counter = Counter()
    for doc_id, source in docs:
        if doc_id % 4 != 3:
            continue
        ps = partners.get(doc_id, set())
        if any(p % 4 != 3 for p in ps):
            status = "neardup_of_base"
        elif any(p % 4 == 3 and p < doc_id for p in ps):
            status = "neardup_in_batch"
        else:
            status = "new"
        want[(source, status)] += 1
    got = {
        (r["source"], r["status"]): r["n_docs"]
        for r in dedup_lsh_incremental(spark, sf_dir).collect()
    }
    assert got == dict(want)
    assert any(s == "neardup_of_base" for _, s in want), "vacuous: no base dups"


def test_bigram_perplexity_matches_python(spark, sf_dir):
    import math
    from collections import Counter

    from content_analytics_etl_spark.plans.text_queries import (
        doc_bigram_perplexity,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY 1"
    ).fetchall()
    per_doc: dict[int, Counter] = {}
    cb: Counter = Counter()
    vocab: set[str] = set()
    for doc_id, text in docs:
        toks = _toks(text)
        vocab.update(toks)
        c = Counter(
            (toks[i], toks[i] + " " + toks[i + 1])
            for i in range(len(toks) - 1)
        )
        per_doc[doc_id] = c
        cb.update(c)
    cp: Counter = Counter()
    for (w1, _bg), n in cb.items():
        cp[w1] += n
    v = len(vocab)
    want = {}
    for doc_id, c in per_doc.items():
        n = sum(c.values())
        if n == 0:
            want[doc_id] = (0, 0.0, 1.0)
            continue
        s = sum(
            math.floor(
                x
                * (
                    round(math.log2(cb[k] + 1), 9)
                    - round(math.log2(cp[k[0]] + v), 9)
                )
                * 1000000000.0
                + 0.5
            )
            for k, x in c.items()
        )
        ce = float(-s) / 1000000000.0 / n
        want[doc_id] = (n, ce, round(2.0 ** ce, 6))
    got = {
        r["doc_id"]: (
            r["n_bigrams"],
            r["cross_entropy_bits"],
            r["perplexity"],
        )
        for r in doc_bigram_perplexity(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for k in want:
        n_w, ce_w, ppl_w = want[k]
        n_g, ce_g, ppl_g = got[k]
        assert n_g == n_w, k
        assert ce_g == ce_w, (k, ce_g, ce_w)
        assert abs(ppl_g - ppl_w) < 1e-6, (k, ppl_g, ppl_w)
