"""Round-9 edge-semantics fixtures (ADVICE r8).

- ``embedding_drift_monitor`` must report a label present in only ONE
  snapshot (appearing/disappearing population — the strongest drift
  signal a monitor exists to catch) with count/share 0 on the missing
  side and NULL centroid columns, instead of silently dropping it via
  the old inner join.
- ``dedup_minhash_band_tuning`` must emit all three band configs even
  on a degenerate corpus where a config (here: every config) yields
  zero candidate pairs — n_candidates=0 with NULL-guarded ratios, not a
  vanished row.
"""

from __future__ import annotations

import math

import pytest

from content_analytics_etl_spark.plans.dedup_queries import (
    LSH_TUNE_CONFIGS,
    dedup_minhash_band_tuning,
)
from content_analytics_etl_spark.plans.similarity_queries import (
    embedding_drift_monitor,
)


@pytest.fixture(scope="module")
def onesided_dir(spark, tmp_path_factory) -> str:
    """sf_dir with an embeddings table where label 99 exists only at odd
    vec_ids — i.e. only in the parity snapshot 'b'."""
    out = tmp_path_factory.mktemp("onesided_sf")
    rows = []
    for i in range(40):
        # label 1 everywhere; label 99 only on odd ids (snap 'b')
        label = 99 if (i % 2 == 1 and i >= 31) else 1
        rows.append((i, [float(i % 7), 1.0, float(label)], label))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(out / "embeddings.parquet"))
    return str(out)


def test_drift_monitor_reports_one_sided_label(spark, onesided_dir):
    got = {r["label"]: r for r in embedding_drift_monitor(spark, onesided_dir).collect()}
    assert 99 in got, "label present in only one snapshot must not vanish"
    r99 = got[99]
    assert r99["n_a"] == 0 and r99["n_b"] > 0
    assert r99["share_a"] == 0.0 and r99["share_b"] > 0.0
    assert r99["share_delta"] == r99["share_b"]
    assert r99["centroid_cosine"] is None and r99["centroid_drift"] is None
    # the two-sided label keeps real centroid geometry
    r1 = got[1]
    assert r1["n_a"] > 0 and r1["n_b"] > 0
    assert r1["centroid_cosine"] is not None
    assert not math.isnan(r1["centroid_cosine"])


@pytest.fixture(scope="module")
def alldistinct_dir(spark, tmp_path_factory) -> str:
    """sf_dir whose documents share no shingles at all — every LSH band
    config produces zero candidate pairs and the truth set is empty."""
    out = tmp_path_factory.mktemp("alldistinct_sf")
    docs = [
        (i, " ".join(f"d{i}w{k}" for k in range(10)), "en", f"src{i % 3}", 60)
        for i in range(30)
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(out / "documents.parquet"))
    return str(out)


def test_band_tuning_reports_vacuous_configs(spark, alldistinct_dir):
    rows = dedup_minhash_band_tuning(spark, alldistinct_dir).collect()
    assert len(rows) == len(LSH_TUNE_CONFIGS)
    assert {(r["bands"], r["rows_per_band"]) for r in rows} == set(LSH_TUNE_CONFIGS)
    for r in rows:
        assert r["n_candidates"] == 0 and r["n_hits"] == 0 and r["n_truth"] == 0
        assert r["precision"] is None  # 0/0 guarded, not NaN
        assert r["recall"] is None


def test_warehouse_compact_write_once_and_prune(spark, sf_dir):
    """The compaction materialization now follows the shared
    materialize_once discipline (VERDICT r8 #6): stale-fingerprint dirs
    are pruned, a concurrent writer's live .tmp- dir survives, and the
    build-scoped fragment staging dir is removed after compaction."""
    import os
    import shutil

    from content_analytics_etl_spark.plans._util import (
        source_fingerprint,
        warehouse_root,
    )
    from content_analytics_etl_spark.plans.analytics_queries import (
        warehouse_compact_roundtrip,
    )

    root = warehouse_root(spark)
    stale = os.path.join(root, "orders_compact_deadbeef0000")
    live_tmp = os.path.join(root, "orders_compact_deadbeef0000.tmp-99999")
    key = source_fingerprint(sf_dir, "orders")
    live = os.path.join(root, f"orders_compact_{key}")
    shutil.rmtree(live, ignore_errors=True)
    for d in (stale, live_tmp):
        os.makedirs(d, exist_ok=True)
        open(os.path.join(d, "_SUCCESS"), "w").close()

    warehouse_compact_roundtrip(spark, sf_dir).collect()
    assert os.path.exists(os.path.join(live, "_SUCCESS"))
    assert not os.path.exists(stale), "stale-fingerprint compact dir not pruned"
    assert os.path.exists(live_tmp), "concurrent writer's tmp dir was pruned"
    shutil.rmtree(live_tmp, ignore_errors=True)
    # no frag staging dirs left behind
    assert not [d for d in os.listdir(root) if ".frag" in d]

    mtime = os.path.getmtime(os.path.join(live, "_SUCCESS"))
    warehouse_compact_roundtrip(spark, sf_dir).collect()
    assert os.path.getmtime(os.path.join(live, "_SUCCESS")) == mtime
