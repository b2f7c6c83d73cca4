"""Round-13 additions: the two-level (fixed-target-cell-size)
clustered quantizer behind sim_neardup_clustered (VERDICT r12 #1) and
the bucket-local near-dup verify (VERDICT r12 #3)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F


def _e(spark, sf_dir):
    from content_analytics_etl_spark.functions.vectors import (
        l2_norm,
        to_double_array,
    )
    from content_analytics_etl_spark.plans._util import t

    return (
        t(spark, sf_dir, "embeddings")
        .select("vec_id", to_double_array("embedding").alias("v"))
        .withColumn("nrm", l2_norm(F.col("v")))
    )


def test_clus_params_fixed_target_cell_size(spark, sf001_dir):
    """k = max(round(N/T), 8) — UNCAPPED since round 14 — and
    s = round(sqrt(k)): the fixed-T contract that makes the pair scan
    linear in N at any corpus size."""
    from content_analytics_etl_spark.plans.similarity_queries import (
        CLUS_K_MIN,
        CLUS_TARGET,
        _clus_params_rel,
    )

    e = _e(spark, sf001_dir)
    n = e.count()
    row = _clus_params_rel(e).collect()[0]
    want_k = max(CLUS_K_MIN, round(n / CLUS_TARGET))
    assert row["k"] == want_k
    assert row["s"] == round(np.sqrt(want_k))


def test_two_level_assign_matches_brute_when_all_supers_probed(
    spark, sf001_dir
):
    """When CLUS_SUPER_PROBE ≥ s the super pruning is a no-op, so the
    two-level assignment must equal the brute nearest-CLUS_PROBE-cells
    assignment computed independently in numpy (same (d2, cid) tie
    order). Pins the level-2 plumbing — grouping cells under supers,
    filtering by probed sids, flattening — against an implementation
    that has none of it."""
    from content_analytics_etl_spark.plans.similarity_queries import (
        CLUS_PROBE,
        CLUS_SUPER_PROBE,
        _clus_assign,
        _clus_params_rel,
    )

    e = _e(spark, sf001_dir)
    params = _clus_params_rel(e).collect()[0]
    assert CLUS_SUPER_PROBE >= params["s"], "sf0.001 must exercise no-op pruning"
    rows = e.select("vec_id", "v").collect()
    vecs = {r["vec_id"]: np.array(r["v"]) for r in rows}
    cents = {i: vecs[i] for i in range(params["k"])}
    want = set()
    for vid, v in vecs.items():
        d2 = sorted(
            (float(np.dot(v - cv, v - cv)), cid) for cid, cv in cents.items()
        )
        want |= {(vid, cid) for _, cid in d2[:CLUS_PROBE]}
    got = {
        (r["vec_id"], r["cid"])
        for r in _clus_assign(e, _clus_params_rel(e)).collect()
    }
    assert got == want


def test_two_level_assign_prunes_to_probed_supers(spark):
    """On a corpus big enough that s > CLUS_SUPER_PROBE (scratch sf1:
    20k vectors → k=833, s=29) the pruning is REAL: every assigned
    cell must be owned — within its CLUS_CELL_SPILL nearest supers —
    by one of the vector's CLUS_SUPER_PROBE nearest supers, recomputed
    independently here from the same deterministic init."""
    import os

    import pytest

    from content_analytics_etl_spark.plans.similarity_queries import (
        CLUS_CELL_SPILL,
        CLUS_SUPER_PROBE,
        _clus_assign,
        _clus_params_rel,
    )

    sf_dir = ".scratch/sf1"
    if not os.path.isdir(sf_dir):
        pytest.skip("scratch sf1 corpus not generated (tools/gen_testdata.py)")
    e = _e(spark, sf_dir)
    params = _clus_params_rel(e).collect()[0]
    k, s = params["k"], params["s"]
    assert s > CLUS_SUPER_PROBE, "corpus must exercise real pruning"
    rows = e.select("vec_id", "v").collect()
    vecs = {r["vec_id"]: np.array(r["v"]) for r in rows}
    sups = {i: vecs[i] for i in range(s)}

    def top_sids(v, p):
        d2 = sorted(
            (float(np.dot(v - sv, v - sv)), sid) for sid, sv in sups.items()
        )
        return [sid for _, sid in d2[:p]]

    owners = {
        cid: set(top_sids(vecs[cid], CLUS_CELL_SPILL)) for cid in range(k)
    }
    asg = _clus_assign(e, _clus_params_rel(e)).collect()
    assert asg
    pruned_hit = False
    for r in asg:
        probed = set(top_sids(vecs[r["vec_id"]], CLUS_SUPER_PROBE))
        assert owners[r["cid"]] & probed
        if len(owners[r["cid"]] | probed) < s:
            pruned_hit = True
    assert pruned_hit


def test_bucket_local_verify_matches_distinct_then_verify(spark, sf01_dir):
    """The bucket-local pairs (verify inside the cid join, distinct
    after the filter) must equal the old distinct-candidates-then-
    verify chain row for row — the parity VERDICT r12 #3 asks for."""
    from content_analytics_etl_spark.functions.vectors import dot_product
    from content_analytics_etl_spark.plans.similarity_queries import (
        NEARDUP_COSINE,
        _clus_cand_pairs,
    )

    e = _e(spark, sf01_dir)
    cand, pairs = _clus_cand_pairs(spark, sf01_dir)
    ea = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na_"),
    )
    eb = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb_"),
    )
    cos = dot_product(F.col("va"), F.col("vb")) / (
        F.col("na_") * F.col("nb_")
    )
    old = (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= NEARDUP_COSINE)
    )
    got = {tuple(r) for r in pairs.collect()}
    want = {tuple(r) for r in old.collect()}
    assert got == want and got


def test_lsh_bucket_local_verify_parity(spark, sf001_dir):
    """sim_neardup_pairs' bucket-local verify (cosine inside the
    band-key join, distinct after the filter) must equal the old
    distinct-candidates-then-verify chain row for row."""
    from content_analytics_etl_spark.functions.vectors import dot_product
    from content_analytics_etl_spark.plans._util import t
    from content_analytics_etl_spark.plans.similarity_queries import (
        NEARDUP_COSINE,
        _nd_candidates,
        sim_neardup_pairs,
    )

    emb = t(spark, sf001_dir, "embeddings")
    e = _e(spark, sf001_dir)
    cand = _nd_candidates(emb)
    ea = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    eb = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos = dot_product(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    old = (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= NEARDUP_COSINE)
    )
    got = {tuple(r) for r in sim_neardup_pairs(spark, sf001_dir).collect()}
    want = {tuple(r) for r in old.collect()}
    assert got == want and got
