"""Explicit schemas for every table the engine reads.

The reference infers all schemas (``spark.read.json(path)`` with no schema
— ``ETL_full.py:33``, ``ETL_one_day.py:13``), which costs a full extra
scan job before any work starts and makes the result schema
data-dependent. At 100 TB an inference pass is unaffordable and a
data-dependent schema is a correctness hazard, so every reader here
declares its schema up front.
"""

from __future__ import annotations

from pyspark.sql import types as T

__all__ = [
    "VIEWING_LOG_SCHEMA",
    "VIEWING_LOG_FLAT_SCHEMA",
    "STAR_SCHEMAS",
    "TABLE_NAMES",
]

# ---------------------------------------------------------------------------
# Viewing-log input (the reference's native data model, SURVEY.md §1.1):
# Elasticsearch-export JSON lines with an envelope and a nested `_source`
# payload (reference: Dataset/sample_20220401.jsonl:1).
# ---------------------------------------------------------------------------

VIEWING_LOG_FLAT_SCHEMA = T.StructType(
    [
        T.StructField("Contract", T.StringType(), True),  # '0' = invalid sentinel
        T.StructField("Mac", T.StringType(), True),
        T.StructField("TotalDuration", T.LongType(), True),  # seconds
        T.StructField("AppName", T.StringType(), True),
    ]
)

VIEWING_LOG_SCHEMA = T.StructType(
    [
        T.StructField("_index", T.StringType(), True),
        T.StructField("_type", T.StringType(), True),
        T.StructField("_id", T.StringType(), True),
        T.StructField("_score", T.LongType(), True),
        T.StructField("_source", VIEWING_LOG_FLAT_SCHEMA, True),
    ]
)

# ---------------------------------------------------------------------------
# Star schema (driver-generated testdata, TESTDATA.md / FIXTURES.md §2).
# Declared explicitly so scans prune columns and never pay inference.
# ---------------------------------------------------------------------------

STAR_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType(), True),
            T.StructField("r_name", T.StringType(), True),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType(), True),
            T.StructField("n_name", T.StringType(), True),
            T.StructField("n_regionkey", T.IntegerType(), True),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType(), True),
            T.StructField("c_name", T.StringType(), True),
            T.StructField("c_nationkey", T.IntegerType(), True),
            T.StructField("c_acctbal", T.DoubleType(), True),
            T.StructField("c_mktsegment", T.StringType(), True),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType(), True),
            T.StructField("s_name", T.StringType(), True),
            T.StructField("s_nationkey", T.IntegerType(), True),
            T.StructField("s_acctbal", T.DoubleType(), True),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType(), True),
            T.StructField("p_name", T.StringType(), True),
            T.StructField("p_brand", T.StringType(), True),
            T.StructField("p_type", T.StringType(), True),
            T.StructField("p_size", T.IntegerType(), True),
            T.StructField("p_retailprice", T.DoubleType(), True),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), True),
            T.StructField("o_custkey", T.LongType(), True),
            T.StructField("o_orderstatus", T.StringType(), True),
            T.StructField("o_totalprice", T.DoubleType(), True),
            T.StructField("o_orderdate", T.TimestampType(), True),
            T.StructField("o_orderpriority", T.StringType(), True),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType(), True),
            T.StructField("l_partkey", T.LongType(), True),
            T.StructField("l_suppkey", T.LongType(), True),
            T.StructField("l_linenumber", T.IntegerType(), True),
            T.StructField("l_quantity", T.DoubleType(), True),
            T.StructField("l_extendedprice", T.DoubleType(), True),
            T.StructField("l_discount", T.DoubleType(), True),
            T.StructField("l_tax", T.DoubleType(), True),
            T.StructField("l_returnflag", T.StringType(), True),
            T.StructField("l_linestatus", T.StringType(), True),
            T.StructField("l_shipdate", T.TimestampType(), True),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("n_chars", T.LongType(), True),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            T.StructField("label", T.IntegerType(), True),
        ]
    ),
}

TABLE_NAMES = tuple(STAR_SCHEMAS)
