"""Session-scoped curation-manifest materialization (VERDICT r6 #4).

The manifest is the junction of five expensive branch pipelines; both
registered consumers (manifest query, funnel rollup) must read ONE
materialization per (session, corpus snapshot) instead of re-executing
the pipeline, and a regenerated corpus must invalidate it.
"""

from __future__ import annotations

import shutil

import pytest

from content_analytics_etl_spark.cache import _SESSION_CACHE
from content_analytics_etl_spark.plans.curation_queries import (
    _manifest_materialized,
    corpus_curation_funnel,
    corpus_curation_manifest,
)
from content_analytics_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-manifest-mat")


def test_manifest_and_funnel_share_one_materialization(spark):
    m1 = corpus_curation_manifest(spark, SF_DIR)
    m2 = corpus_curation_manifest(spark, SF_DIR)
    assert m1 is m2, "second invocation must return the cached frame"
    assert m1.storageLevel.useMemory or m1.storageLevel.useDisk
    # the funnel derives from the same materialization (same cache key)
    before = dict(_SESSION_CACHE)
    corpus_curation_funnel(spark, SF_DIR).collect()
    assert dict(_SESSION_CACHE) == before, "funnel must not rebuild"


def test_regenerated_corpus_invalidates(spark, tmp_path):
    # copy the corpus: different path+mtime → different source fingerprint
    for name in (
        "documents", "region", "nation", "customer", "supplier",
        "part", "orders", "lineitem", "events", "embeddings",
    ):
        shutil.copy(f"{SF_DIR}/{name}.parquet", tmp_path / f"{name}.parquet")
    a = _manifest_materialized(spark, SF_DIR)
    b = _manifest_materialized(spark, str(tmp_path))
    assert a is not b, "a different corpus snapshot must materialize anew"
