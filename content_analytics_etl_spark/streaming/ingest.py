"""Incremental viewing-log ingestion — the engine's replacement for the
reference's "strategy 2" (per-file ETL + driver-loop union,
``test_method2_eachFILE.py:101-133``, 2.45× slower than the fused read
and re-executes a 30-scan lineage on every failure).

The Spark-native recovery story: a checkpointed file-source stream with
``Trigger.AvailableNow`` over the daily-JSONL drop directory, appending
flattened rows to a date-partitioned parquet table. Each invocation
processes ONLY files the checkpoint hasn't seen — per-day incremental
cost, exactly-once output, and a restart resumes mid-backlog for free.
Downstream analytics (pipeline.py) then read the partitioned table with
partition pruning instead of filename arithmetic.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..schemas import VIEWING_LOG_SCHEMA

__all__ = ["ingest_viewing_logs"]


def ingest_viewing_logs(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    timeout_s: int = 120,
) -> None:
    """One incremental ingest pass (availableNow): new
    ``YYYYMMDD.jsonl`` files in ``input_dir`` → flattened rows appended
    under ``output_dir/log_date=.../``. Idempotent per file via the
    checkpoint; call again whenever new days land."""
    raw = spark.readStream.schema(VIEWING_LOG_SCHEMA).json(input_dir)
    flat = raw.select(
        "_source.*",
        F.to_date(
            F.regexp_extract(F.input_file_name(), r"(\d{8})\.jsonl?$", 1), "yyyyMMdd"
        ).alias("log_date"),
    )
    q = (
        flat.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("log_date")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
