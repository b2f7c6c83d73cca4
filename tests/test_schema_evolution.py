"""Schema evolution across parquet file generations (``read_evolved``):
a 100 TB table's files are written over years of schema versions, and
the reader must (a) serve old files under the new schema with nulls,
(b) prune columns a newer writer added, (c) never pay mergeSchema's
every-footer planning scan on the production path.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from content_analytics_etl_spark.sources.readers import read_evolved

TARGET = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("device", T.StringType(), True),  # added in v2
    ]
)


def _write_generations(spark, root):
    v1 = spark.createDataFrame(
        [(1, 1.5), (2, 2.5)], "event_id long, value double"
    )
    v1.coalesce(1).write.parquet(f"{root}/g=1")
    v2 = spark.createDataFrame(
        [(3, 3.5, "tv"), (4, 4.5, "phone")],
        "event_id long, value double, device string",
    )
    v2.coalesce(1).write.parquet(f"{root}/g=2")
    # v3 adds a column the target schema does NOT declare yet
    v3 = spark.createDataFrame(
        [(5, 5.5, "tv", "eu")],
        "event_id long, value double, device string, region string",
    )
    v3.coalesce(1).write.parquet(f"{root}/g=3")


def test_declared_schema_spans_generations(spark, tmp_path):
    root = str(tmp_path / "evolved")
    _write_generations(spark, root)
    df = read_evolved(spark, f"{root}/g=*", TARGET)
    rows = {r["event_id"]: (r["value"], r["device"]) for r in df.collect()}
    assert rows == {
        1: (1.5, None),  # pre-device file -> null
        2: (2.5, None),
        3: (3.5, "tv"),
        4: (4.5, "phone"),
        5: (5.5, "tv"),  # v3's extra 'region' pruned silently
    }
    assert [f.name for f in df.schema.fields] == [
        "event_id",
        "value",
        "device",
    ]


def test_discovery_path_sees_union_schema(spark, tmp_path):
    root = str(tmp_path / "evolved")
    _write_generations(spark, root)
    names = {
        f.name for f in read_evolved(spark, f"{root}/g=*", TARGET, discover=True).schema.fields
    }
    assert {"event_id", "value", "device", "region"} <= names


def test_production_scan_prunes_to_requested_columns(spark, tmp_path):
    root = str(tmp_path / "evolved")
    _write_generations(spark, root)
    plan = (
        read_evolved(spark, f"{root}/g=*", TARGET)
        .filter(F.col("value") > 2)
        .select("event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # scan reads only the two referenced columns and pushes the filter
    assert "ReadSchema: struct<event_id:bigint,value:double>" in plan
    assert "PushedFilters: [IsNotNull(value), GreaterThan(value,2.0)]" in plan
