"""Python-recomputed oracles for the data-selection additions: DSIR
importance weights, the hashed linear quality classifier, and the
z-order layout audit. (The DuckDB hash oracle is the primary gate;
these pin the SEMANTICS against an independent pure-python recompute on
sf0.001, plus the layout properties that make z-order worth running.)"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import duckdb

from content_analytics_etl_spark.plans.analytics_queries import (
    lineitem_zorder_layout,
)
from content_analytics_etl_spark.plans.selection_queries import (
    N_BUCKETS,
    TARGET_LANG,
    W_SPAN,
    doc_dsir_importance,
    doc_quality_classifier,
)


def _docs(sf_dir):
    return duckdb.sql(
        f"SELECT doc_id, lang, text FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id"
    ).fetchall()


def _toks(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.lower()).strip().split(" ")


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_dsir_importance_matches_python(spark, sf_dir):
    per_doc: dict[int, Counter] = {}
    cr: Counter = Counter()
    ct: Counter = Counter()
    langs: dict[int, str] = {}
    for doc_id, lang, text in _docs(sf_dir):
        toks = _toks(text)
        langs[doc_id] = lang
        c = Counter(
            _h64("dsir|" + toks[i] + " " + toks[i + 1]) % N_BUCKETS
            for i in range(len(toks) - 1)
        )
        per_doc[doc_id] = c
        for b, n in c.items():
            cr[b] += n
            if lang == TARGET_LANG:
                ct[b] += n
    tr, tt = sum(cr.values()), sum(ct.values())
    const = round(math.log2(tt + N_BUCKETS), 9) - round(
        math.log2(tr + N_BUCKETS), 9
    )
    want = {}
    for doc_id, c in per_doc.items():
        n_bg = sum(c.values())
        if n_bg == 0:
            want[doc_id] = (0, 0.0, False)
            continue
        s = sum(
            math.floor(
                x
                * (
                    round(math.log2(ct[b] + 1), 9)
                    - round(math.log2(cr[b] + 1), 9)
                )
                * 1e9
                + 0.5
            )
            for b, x in c.items()
        )
        logw = s / 1e9 - n_bg * const
        want[doc_id] = (n_bg, logw, logw > 0)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["logw"], r["selected"])
        for r in doc_dsir_importance(spark, sf_dir).collect()
    }
    assert got == want
    assert any(v[2] for v in want.values()), "no doc selected — vacuous"
    assert any(not v[2] for v in want.values()), "all selected — vacuous"


def test_quality_classifier_matches_python_and_is_shuffle_free(
    spark, sf_dir
):
    want = {}
    for doc_id, _lang, text in _docs(sf_dir):
        toks = _toks(text)
        m = sum(
            _h64("qclsw|" + str(_h64("qcls|" + t) % N_BUCKETS)) % W_SPAN
            - 1000
            for t in toks
        )
        want[doc_id] = (len(toks), m, m / (len(toks) * 1000), m > 0)
    df = doc_quality_classifier(spark, sf_dir)
    got = {
        r["doc_id"]: (r["n_tokens"], r["margin_milli"], r["score"], r["keep"])
        for r in df.collect()
    }
    assert got == want
    # the design claim: per-doc scoring never leaves the scan projection
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "classifier must be shuffle-free"


def _spread(x: int) -> int:
    x = (x | (x << 4)) & 0x0F0F
    x = (x | (x << 2)) & 0x3333
    return (x | (x << 1)) & 0x5555


def test_zorder_layout_matches_python(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT l_partkey, l_suppkey FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    pmin = min(r[0] for r in rows)
    pmax = max(r[0] for r in rows)
    smin = min(r[1] for r in rows)
    smax = max(r[1] for r in rows)
    per: dict[tuple[str, int], list[tuple[int, int]]] = {}
    for p, s in rows:
        pb = ((p - pmin) * 256) // (pmax - pmin + 1)
        sb = ((s - smin) * 256) // (smax - smin + 1)
        z = _spread(pb) | (_spread(sb) << 1)
        per.setdefault(("zorder", z // 4096), []).append((p, s))
        per.setdefault(("linear", pb // 16), []).append((p, s))
    want = {
        k: (
            len(v),
            min(p for p, _ in v),
            max(p for p, _ in v),
            min(s for _, s in v),
            max(s for _, s in v),
        )
        for k, v in per.items()
    }
    got = {}
    fracs = {}
    for r in lineitem_zorder_layout(spark, sf_dir).collect():
        got[(r["layout"], r["file_id"])] = (
            r["n_rows"],
            r["p_min"],
            r["p_max"],
            r["s_min"],
            r["s_max"],
        )
        fracs[(r["layout"], r["file_id"])] = (
            r["p_span_frac"],
            r["s_span_frac"],
        )
    assert got == want
    # the reason z-order exists: every zorder file bounds BOTH dims
    # (each spans at most ~1/4 of each domain: top-2 interleaved bits
    # of each dimension are fixed within a file), while linear files
    # span the entire suppkey domain.
    for (layout, _fid), (pf, sf) in fracs.items():
        if layout == "zorder":
            assert pf <= 0.30 and sf <= 0.30, (layout, pf, sf)
    lin_s = [sf for (lay, _), (_, sf) in fracs.items() if lay == "linear"]
    assert all(sf > 0.9 for sf in lin_s), "linear files should span suppkey"
