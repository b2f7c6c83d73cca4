"""Sources/sinks + multimodal plumbing tests."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

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
    fcols = [f"f{k}" for k in range(FEATURE_DIM)]
    assert all(c in feats.columns for c in fcols)  # scalar cols, no arrays
    rows = feats.limit(5).collect()
    for r in rows:
        vec = [r[c] for c in fcols]
        assert abs(sum(vec) - 1.0) < 1e-9  # L1-normalized histogram
    assert feats.count() == docs.count()


def test_decode_payload_contract():
    """All three decoders are REAL (stdlib BMP/WAV/AVI parsing): garbage
    bytes raise ValueError, valid payloads decode by kind."""
    from content_analytics_etl_spark.multimodal import encode_avi24, encode_bmp24

    with pytest.raises(ValueError):
        decode_payload(b"bytes", "image")
    with pytest.raises(ValueError):
        decode_payload(b"bytes", "video")
    assert decode_payload(encode_bmp24(2, 2, 0), "image")[:2] == (2, 2)
    assert decode_payload(encode_avi24(2, 2, 1, 10, 0), "video")[:2] == (2, 2)


def test_format_roundtrip_orc_csv_json(spark, sf_dir, tmp_path):
    """write_table/read_table over Spark's built-in formats must
    preserve rows and schema exactly (ORC columnar; CSV/JSON with
    declared schema, no inference)."""
    from content_analytics_etl_spark.sources.readers import load_table, read_table
    from content_analytics_etl_spark.sources.writers import write_table

    src = load_table(spark, sf_dir, "nation")
    want = {tuple(r) for r in src.collect()}
    for fmt, opts in [
        ("orc", {}),
        ("csv", {"header": "true"}),
        ("json", {}),
    ]:
        path = str(tmp_path / f"nation_{fmt}")
        write_table(src, path, fmt=fmt, **opts)
        back = read_table(spark, path, src.schema, fmt=fmt, **opts)
        assert back.schema == src.schema
        assert {tuple(r) for r in back.collect()} == want


def test_orc_partitioned_pushdown(spark, sf_dir, tmp_path):
    """ORC gets the same partition-pruning + predicate-pushdown behavior
    as parquet: a filter on the partition column prunes directories."""
    from content_analytics_etl_spark.sources.readers import load_table, read_table
    from content_analytics_etl_spark.sources.writers import write_table

    src = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    path = str(tmp_path / "events_orc")
    write_table(src, path, fmt="orc", partition_cols=("event_date",))
    import pyspark.sql.types as T

    schema = T.StructType(
        [f for f in src.schema.fields if f.name != "event_date"]
        + [T.StructField("event_date", T.DateType())]
    )
    back = read_table(spark, path, schema, fmt="orc")
    one_day = back.filter(F.col("event_date") == F.lit("2024-01-02"))
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    want = src.filter(F.col("event_date") == F.lit("2024-01-02")).count()
    assert want > 0  # the chosen day exists in the synthetic data
    assert one_day.count() == want


def test_compact_parquet_merges_small_files(spark, sf_dir, tmp_path):
    """32 tiny files -> 1 compacted file, row/content parity."""
    from content_analytics_etl_spark.sources.readers import load_table
    from content_analytics_etl_spark.sources.writers import compact_parquet

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    e = load_table(spark, sf_dir, "events")
    e.repartition(32).write.parquet(src)
    import glob

    assert len(glob.glob(f"{src}/*.parquet")) == 32
    n = compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    assert n == 1
    assert len(glob.glob(f"{dst}/*.parquet")) == 1
    before = e.count()
    after = spark.read.parquet(dst).count()
    assert before == after
