"""Sinks (SURVEY.md §2.1 S5, §2.9 X1).

The reference forces single-file CSV with ``repartition(1)`` — a full
shuffle just to collapse to one partition (``ETL_full.py:71``). Here the
small-output path uses ``coalesce(1)`` (no shuffle) and the at-scale path
writes partitioned parquet — never collapse 100 TB to one task.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "write_csv_single",
    "write_parquet_partitioned",
    "write_table",
    "compact_parquet",
]


def write_csv_single(df: DataFrame, path: str, *, header: bool = True) -> None:
    """Single-file CSV for small final outputs (reference S5 semantics,
    minus the shuffle: coalesce(1) instead of repartition(1))."""
    df.coalesce(1).write.option("header", str(header).lower()).mode("overwrite").csv(path)


def write_parquet_partitioned(
    df: DataFrame, path: str, *partition_cols: str, mode: str = "overwrite"
) -> None:
    """The at-scale sink: partitioned parquet (e.g. by date), enabling
    partition pruning for every downstream reader."""
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    *,
    target_file_bytes: int = 128 << 20,
) -> int:
    """Small-file compaction — the maintenance job every streaming /
    incremental sink eventually needs (each micro-batch writes a file;
    a month of 5-minute batches is 8k tiny files whose open/footer cost
    dominates scans). Sizes the output from the actual on-disk bytes:
    ``ceil(total/target)`` files via ``coalesce`` (no shuffle — merging
    partitions never needs one). Returns the output file count.

    At 100 TB run this per partition directory (date=.../) so each
    compaction is an independent, restartable unit."""
    total = 0
    for root, _dirs, files in os.walk(src_dir):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    n_files = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(src_dir).coalesce(n_files).write.mode("overwrite").parquet(
        dst_dir
    )
    return n_files


def write_table(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "parquet",
    partition_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Format-generic sink over Spark's built-in file formats
    (parquet / orc / json / csv / text). Parquet and ORC are the
    columnar at-scale choices (predicate pushdown + column pruning at
    the scan); JSON/CSV are interchange formats — row-oriented, no
    pushdown, read back with an explicit schema (never inference)."""
    writer = df.write.mode(mode).format(fmt)
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)
