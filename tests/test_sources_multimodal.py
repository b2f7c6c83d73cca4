"""Sources/sinks + multimodal plumbing tests."""

from __future__ import annotations

import glob

import pytest

from content_analytics_etl_spark.multimodal import (
    FEATURE_DIM,
    decode_payload,
    extract_features,
    synthetic_assets,
)
from content_analytics_etl_spark.sources.readers import load_table
from content_analytics_etl_spark.sources.writers import (
    write_csv_single,
    write_parquet_partitioned,
)


def test_load_table_schemas(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    assert li.schema["l_orderkey"].dataType.simpleString() == "bigint"
    ev = load_table(spark, sf_dir, "events")
    assert ev.schema["ts"].dataType.simpleString() == "timestamp"
    with pytest.raises(KeyError):
        load_table(spark, sf_dir, "nope")


def test_csv_single_file_sink(spark, tmp_path):
    df = spark.range(100).withColumnRenamed("id", "x")
    out = str(tmp_path / "out_csv")
    write_csv_single(df, out)
    files = glob.glob(f"{out}/part-*.csv")
    assert len(files) == 1  # single file, no repartition(1) shuffle
    assert open(files[0]).readline().strip() == "x"


def test_partitioned_parquet_sink(spark, tmp_path):
    from pyspark.sql import functions as F

    df = spark.range(100).select(F.col("id"), (F.col("id") % 4).alias("bucket"))
    out = str(tmp_path / "out_parq")
    write_parquet_partitioned(df, out, "bucket")
    parts = glob.glob(f"{out}/bucket=*")
    assert len(parts) == 4
    back = spark.read.parquet(out)
    assert back.count() == 100


def test_multimodal_assets_and_features(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assets = synthetic_assets(docs)
    assert dict(assets.dtypes)["payload"] == "binary"
    feats = extract_features(assets)
    rows = feats.limit(5).collect()
    assert all(len(r["features"]) == FEATURE_DIM for r in rows)
    for r in rows:
        assert abs(sum(r["features"]) - 1.0) < 1e-9  # L1-normalized histogram
    assert feats.count() == docs.count()


def test_decode_payload_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_payload(b"bytes", "image")
