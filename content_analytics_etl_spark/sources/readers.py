"""Sources: schema-declared scans (SURVEY.md §2.1, S1-S4).

The reference reads JSON with inference (S1/S2: ``ETL_one_day.py:12-14``,
``ETL_full.py:33``) and selects date ranges with a driver-side filename
loop (S3: ``ETL_full.py:17-30``). Here:

- every scan declares its schema (no inference job);
- date-range selection is a *predicate* — on a partitioned layout Catalyst
  turns it into partition pruning, so the driver never enumerates files;
- multi-file reads pass a directory/glob to one reader call (the
  reference's own experiment showed the fused read 2.45× faster than
  per-file union — ``test_method1_readALL.py:119-123``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import STAR_SCHEMAS, TABLE_NAMES, VIEWING_LOG_SCHEMA

__all__ = ["load_table", "load_tables", "read_viewing_log"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one star-schema parquet table with its declared schema.

    Parquet + declared schema ⇒ column pruning and predicate pushdown
    reach the file scan (``.explain`` shows PushedFilters/ReadSchema).
    """
    if name not in STAR_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    return spark.read.schema(STAR_SCHEMAS[name]).parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    if not names:
        names = TABLE_NAMES
    return {n: load_table(spark, sf_dir, n) for n in names}


def read_viewing_log(
    spark: SparkSession,
    path: str | list[str],
    *,
    flatten: bool = True,
    date_from_filename: bool = False,
) -> DataFrame:
    """Read Elasticsearch-export viewing logs (reference S1/S2).

    Unlike the reference, the schema is declared (VIEWING_LOG_SCHEMA), so
    malformed lines still become all-NULL rows under PERMISSIVE mode but
    no inference scan runs. ``flatten`` applies the P1 struct unnest
    (``select('_source.*')`` — reference ``ETL_full.py:39``); Catalyst's
    nested-schema pruning means the envelope fields are never
    materialized.

    ``date_from_filename`` stamps a ``log_date`` DateType column parsed
    from the reference's ``YYYYMMDD.json`` filename convention
    (``ETL_full.py:26,30``) via ``input_file_name`` — a distributed
    replacement for the driver-side date loop (S3). On a real deployment
    the data would instead live in a ``date=``-partitioned layout and
    this becomes a partition column.
    """
    df = spark.read.schema(VIEWING_LOG_SCHEMA).json(path)
    if date_from_filename:
        df = df.withColumn(
            "log_date",
            F.to_date(
                F.regexp_extract(F.input_file_name(), r"(\d{8})\.jsonl?$", 1),
                "yyyyMMdd",
            ),
        )
    if flatten:
        cols = ["_source.*"] + (["log_date"] if date_from_filename else [])
        df = df.select(*cols)
    return df
