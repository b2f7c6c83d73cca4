"""Sinks (SURVEY.md §2.1 S5, §2.9 X1).

The reference forces single-file CSV with ``repartition(1)`` — a full
shuffle just to collapse to one partition (``ETL_full.py:71``). Here the
small-output path uses ``coalesce(1)`` (no shuffle) and the at-scale path
writes partitioned parquet — never collapse 100 TB to one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["write_csv_single", "write_parquet_partitioned"]


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
