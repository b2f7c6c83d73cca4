"""Property tests for the round-4 operators: bloom-prefiltered
semi-join, winnowing cross-doc overlap, unigram-LM perplexity, ANN
recall audit. Each pins the operator's defining invariant on a fixture
built to stress it, not just re-run the oracle comparison.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from content_analytics_etl_spark.plans.relational_queries import (
    join_bloom_prefilter,
)
from content_analytics_etl_spark.plans.similarity_queries import (
    ANN_TOPK,
    sim_ann_recall_audit,
)
from content_analytics_etl_spark.plans.text_queries import (
    WINNOW_MIN_SHARED,
    WINNOW_W,
    doc_lm_perplexity,
    doc_winnow_overlap,
)

SF = "/root/testdata/sf0.001"


def test_bloom_prefilter_equals_plain_semi_join(spark):
    """The bloom is semantically invisible: the prefiltered aggregate
    must match the plain semi-join aggregate row for row (no false
    negatives; false positives removed by the exact join)."""
    got = {
        r["l_returnflag"]: (r["n_items"], r["revenue"])
        for r in join_bloom_prefilter(spark, SF).collect()
    }
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    keys = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("o_orderkey")
    want = {
        r["l_returnflag"]: (r["n_items"], r["revenue"])
        for r in li.join(keys, li.l_orderkey == keys.o_orderkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
        )
        .collect()
    }
    assert got == want and got  # non-empty and identical


@pytest.fixture()
def planted_overlap_dir(spark, tmp_path):
    """Documents where 0 and 1 share a 16-token run (winnowing
    guarantees shared fingerprints for any run ≥ W+2 tokens) and the
    rest are unique-token noise."""
    shared = " ".join(f"s{k}" for k in range(16))
    rows = [
        (0, f"preA preB {shared} tailA tailB"),
        (1, f"other lead {shared} different tail here"),
    ] + [
        (i, " ".join(f"u{i}x{k}" for k in range(20))) for i in range(2, 30)
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", f"src{i % 3}", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_winnow_overlap_detects_planted_span(spark, planted_overlap_dir):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared_fps"]
        for r in doc_winnow_overlap(spark, planted_overlap_dir).collect()
    }
    # the planted pair is found, with enough shared fingerprints that
    # it clears the reporting floor with margin
    assert (0, 1) in pairs
    assert pairs[(0, 1)] >= WINNOW_MIN_SHARED
    # the noise docs (disjoint vocabularies) produce no pairs at all
    assert all(p == (0, 1) for p in pairs), pairs
    # sanity on the guarantee driving the fixture: a 16-token shared run
    # is ≥ W+2 for the configured window
    assert 16 >= WINNOW_W + 2


@pytest.fixture()
def uniform_vs_rare_dir(spark, tmp_path):
    """A corpus where doc 0 is made of the overwhelmingly common token
    and doc 1 of singleton tokens — perplexity must separate them."""
    rows = [(0, " ".join(["common"] * 50))] + [
        (1, " ".join(f"rare{k}" for k in range(50)))
    ] + [(i, " ".join(["common"] * 30)) for i in range(2, 20)]
    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_lm_perplexity_orders_docs_by_typicality(spark, uniform_vs_rare_dir):
    ppl = {
        r["doc_id"]: r["perplexity"]
        for r in doc_lm_perplexity(spark, uniform_vs_rare_dir).collect()
    }
    # common-token doc: p(common) ≈ 1 ⇒ perplexity near 1;
    # singleton-token doc: p ≈ 2/(N+V) ⇒ perplexity far above
    assert ppl[0] < 1.5
    assert ppl[1] > 50
    assert all(v >= 1.0 - 1e-9 for v in ppl.values())


def test_ann_recall_audit_bounds(spark):
    rows = sim_ann_recall_audit(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_true"] == ANN_TOPK
        assert 0 <= r["n_hit"] <= r["n_true"]
        assert abs(r["recall"] - r["n_hit"] / r["n_true"]) < 1e-12


def test_rfm_quintiles_and_segment_consistent(spark):
    from content_analytics_etl_spark.plans.analytics_queries import (
        customer_rfm_segments,
    )

    rows = customer_rfm_segments(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["r_quintile"] <= 5
        assert 1 <= r["f_quintile"] <= 5
        assert 1 <= r["m_quintile"] <= 5
        assert r["segment"] == f"{r['r_quintile']}{r['f_quintile']}{r['m_quintile']}"
        assert r["recency_days"] >= 0
        assert r["frequency"] >= 1


def test_part_affinity_invariants(spark):
    from content_analytics_etl_spark.plans.analytics_queries import (
        AFFINITY_MIN_BOTH,
        part_affinity,
    )

    rows = part_affinity(spark, SF).collect()
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert r["n_both"] >= AFFINITY_MIN_BOTH
        # co-occurrence cannot exceed either side's own order count
        assert r["n_both"] <= min(r["n_a"], r["n_b"])
        assert r["lift"] > 0
