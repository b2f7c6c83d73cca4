"""Sinks (SURVEY.md §2.1 S5, §2.9 X1).

The reference forces single-file CSV with ``repartition(1)`` — a full
shuffle just to collapse to one partition (``ETL_full.py:71``). Here the
small-output path uses ``coalesce(1)`` (no shuffle) and the at-scale path
writes partitioned parquet — never collapse 100 TB to one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["write_csv_single", "write_parquet_partitioned", "write_table"]


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
