"""Round-10 edge-semantics fixtures (ADVICE r9).

- ``doc_padding_waste`` on a zero-token document must report 0 real
  tokens and 0 truncated tokens (never the old -1 trunc / phantom real
  token), with the empty doc landing in the first length bucket.
- ``events_stl_residual_anomaly`` on a degenerate series whose residual
  MAD is 0 must NULL-guard the robust z (emit no anomaly rows) instead
  of dividing by zero to Infinity — the cross-engine divergence ADVICE
  r9 flagged.
"""

from __future__ import annotations

import math

import pytest

from content_analytics_etl_spark.plans.analytics_queries import (
    events_stl_residual_anomaly,
)
from content_analytics_etl_spark.plans.text_queries import (
    PAD_BUCKET,
    PAD_MAX_LEN,
    doc_padding_waste,
)


@pytest.fixture(scope="module")
def emptydoc_dir(spark, tmp_path_factory) -> str:
    """documents table with an empty doc, a whitespace-only doc, a
    normal doc and an over-cap doc (> PAD_MAX_LEN tokens)."""
    out = tmp_path_factory.mktemp("emptydoc_sf")
    long_text = " ".join(["tok"] * (PAD_MAX_LEN + 25))
    rows = [
        (0, "", "en", "web", 0),
        (1, "   ", "en", "web", 3),
        (2, "three plain words", "en", "web", 17),
        (3, long_text, "en", "web", len(long_text)),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(out / "documents.parquet"))
    return str(out)


def test_padding_waste_zero_token_doc(spark, emptydoc_dir):
    rows = {r["bucket_len"]: r for r in doc_padding_waste(spark, emptydoc_dir).collect()}
    # no negative truncation anywhere, ratios in [0, 1]
    for r in rows.values():
        assert r["truncated_tokens"] >= 0
        assert r["real_tokens"] >= 0
        assert 0.0 <= r["pad_waste_ratio"] <= 1.0
    # the empty/whitespace docs tokenize to [''] (split semantics, n=1,
    # identical in DuckDB) and land in the first bucket with the 3-word
    # doc; nothing truncates there
    first = rows[PAD_BUCKET]
    assert first["n_docs"] == 3
    assert first["real_tokens"] == 5  # 1 + 1 + 3
    assert first["truncated_tokens"] == 0
    # the over-cap doc is clamped to PAD_MAX_LEN and truncates the rest
    capped = rows[max(rows)]
    assert capped["real_tokens"] == PAD_MAX_LEN
    assert capped["truncated_tokens"] == 25


@pytest.fixture(scope="module")
def flatseries_dir(spark, tmp_path_factory) -> str:
    """events table where one type's daily series is flat except a
    single spike near the series END: the spike's own residual is NULL
    (incomplete trend window) but it contaminates a minority of defined
    residuals through the trend/seasonal terms, so the residual MAD is
    exactly 0 while several absolute deviations are > 0 — the precise
    old-code 0-division-to-Infinity trigger ADVICE r9 described."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("flatseries_sf")
    (out / "events.parquet").mkdir()
    days = np.arange(1, 29)
    base = np.datetime64("2024-01-01 12:00:00", "us")
    pq.write_table(
        pa.table({
            "event_id": days.astype("int64") - 1,
            "ts": pa.array(base + ((days - 1) * 86_400_000_000).astype("timedelta64[us]")),
            "user_id": np.ones(len(days), dtype="int64"),
            "event_type": ["flat"] * len(days),
            "value": np.where(days == 27, 1000.0, 5.0),
            "props": ["{}"] * len(days),
        }),
        str(out / "events.parquet" / "part-0.parquet"),
    )
    return str(out)


def test_stl_anomaly_mad_zero_guard(spark, flatseries_dir):
    got = events_stl_residual_anomaly(spark, flatseries_dir).collect()
    # MAD over the flat-dominated residuals is 0 -> z is NULL-guarded:
    # no Infinity rows may pass the > cutoff filter
    for r in got:
        assert r["robust_z"] is not None
        assert math.isfinite(r["robust_z"])
    assert got == [], "MAD=0 series must report no anomalies, not Inf rows"


def test_recall_audit_has_multiprobe_row_dominating_lsh(spark, sf_dir):
    """VERDICT r9 #5: the published recall table carries the multi-probe
    path, and its recall@k dominates single-probe LSH per query (same
    index, superset candidates)."""
    from content_analytics_etl_spark.plans.similarity_queries import (
        sim_ann_recall_audit,
    )

    rows = sim_ann_recall_audit(spark, sf_dir).collect()
    methods = {r["method"] for r in rows}
    assert methods == {"lsh", "lsh_mp", "ivf", "pq", "ivfpq"}
    lsh = {r["query_id"]: r["recall"] for r in rows if r["method"] == "lsh"}
    mp = {r["query_id"]: r["recall"] for r in rows if r["method"] == "lsh_mp"}
    assert set(mp) == set(lsh)
    for q in lsh:
        assert mp[q] >= lsh[q], f"multiprobe recall regressed for query {q}"


def test_heaps_fit_on_growing_vocab(spark, tmp_path_factory):
    """Heaps fit invariants on a corpus whose vocabulary actually grows:
    0 < beta < 1, r2 close to 1; on a vocabulary-capped (flat-V) corpus
    the fit NULL-guards r2 instead of dividing by zero."""
    from content_analytics_etl_spark.plans.text_queries import (
        vocab_heaps_law_fit,
    )

    out = tmp_path_factory.mktemp("heaps_sf")
    # token universe grows with doc_id -> genuine Heaps curve
    rows = [
        (i, " ".join(f"w{(i * 17 + j * 13) % (10 + i)}" for j in range(30)),
         "en", "web", 0)
        for i in range(200)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(out / "documents.parquet"))
    r = vocab_heaps_law_fit(spark, str(out)).collect()[0]
    assert r["n_points"] == 10
    assert 0.0 < r["heaps_beta"] < 1.0
    assert r["r2"] is not None and r["r2"] > 0.5

    flat = tmp_path_factory.mktemp("heaps_flat_sf")
    rows = [
        (i, " ".join(f"w{j % 7}" for j in range(30)), "en", "web", 0)
        for i in range(100)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(flat / "documents.parquet"))
    rf = vocab_heaps_law_fit(spark, str(flat)).collect()[0]
    assert rf["heaps_beta"] == 0.0  # constant V: slope exactly 0
    assert rf["r2"] is None  # no y variance: R^2 undefined, not Inf/NaN


def test_novelty_decay_monotone_semantics(spark, sf_dir):
    """Bucket 0 can have no repeats (nothing is earlier); repeat counts
    never exceed instances; every bigram type is new exactly once."""
    from content_analytics_etl_spark.plans.text_queries import (
        corpus_bigram_novelty_decay,
    )

    rows = corpus_bigram_novelty_decay(spark, sf_dir).collect()
    by_b = {r["bucket"]: r for r in rows}
    assert by_b[0]["n_repeat_instances"] == 0
    for r in rows:
        assert 0 <= r["n_repeat_instances"] <= r["n_instances"]
        assert 0.0 <= r["repeat_share"] <= 1.0


def test_scaled_band_params_values(spark):
    """Pin the corpus-size-scaled LSH knobs at the corpus sizes the
    scaling evidence cites: width stays 8 bits at driver scales,
    11/13 at sf1/sf3 scratch sizes, UNSATURATED through 20M vectors
    (round 12 lifted the ceiling 15 → 27; the old cap bound at
    N ≈ 260k), clamped at ND_MAX_BITS only near 10⁹; the band count is
    FIXED at 6 everywhere (round-11 operating point — growing it
    alongside the probe factor double-paid, wall exp 1.47)."""
    from content_analytics_etl_spark.plans.similarity_queries import (
        ND_MAX_BITS,
        ND_NB_FIXED,
        _nd_params_rel,
    )

    def params(n: int) -> tuple[int, int]:
        df = spark.range(n).selectExpr("id AS vec_id")
        row = _nd_params_rel(df).collect()[0]
        return row["w"], row["nb"]

    nb = ND_NB_FIXED
    assert params(20) == (8, nb)       # sf0.001
    assert params(200) == (8, nb)      # sf0.01
    assert params(2000) == (8, nb)     # sf0.1 (anchor)
    assert params(20000) == (11, nb)   # sf1
    assert params(60000) == (13, nb)   # sf3
    assert params(20_000_000) == (21, nb)   # old cap was 15: now unsaturated
    assert params(1_200_000_000) == (ND_MAX_BITS, nb)  # width clamp at ~10⁹


def test_neardup_banded_subset_of_exact(spark, sf001_dir):
    """The width-scaled banded pairs are a SUBSET of the exhaustive
    threshold pairs (same cosine verify — LSH only prunes candidates),
    and the operating point is non-vacuous at driver sf0.01 scale
    (the 20-vector sf0.001 corpus has no threshold pairs to find)."""
    from pyspark.sql import functions as F

    from content_analytics_etl_spark.plans.similarity_queries import (
        EXACT_CAP,
        sim_neardup_exact,
        sim_neardup_pairs,
    )

    sf = sf001_dir
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in sim_neardup_exact(spark, sf).collect()
    }
    banded = {
        (r["vec_a"], r["vec_b"])
        for r in sim_neardup_pairs(spark, sf)
        .filter((F.col("vec_a") < EXACT_CAP) & (F.col("vec_b") < EXACT_CAP))
        .collect()
    }
    assert banded, "driver-scale operating point must find some pairs"
    assert banded <= exact, "a banded pair failing the exact scan is a bug"
