"""MERGE INTO semantics over plain DataFrames — the CDC apply step.

Spark has no MERGE without a transactional table format (Delta/Iceberg);
this operator expresses last-write-wins merge relationally so the engine
can apply change batches to parquet snapshots: matched keys take the
change row's values, unmatched change keys insert, and a boolean delete
flag removes the key. (``operators/scd.py`` is the history-keeping
sibling; this one maintains a current-state snapshot.)

Scale shape: ONE shuffle — a full-outer join on the business key. With
the target partitioned/bucketed by key and a broadcastable change batch
even that shuffle disappears (AQE picks broadcast-hash at runtime).
Matched-ness uses explicit presence flags, never data-column
nullability (the scd2 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_upsert"]


def merge_upsert(
    target: DataFrame,
    changes: DataFrame,
    *,
    key: str,
    delete_flag: str = "is_delete",
) -> DataFrame:
    """Apply ``changes`` (same columns as ``target``, plus an optional
    boolean ``delete_flag``) to ``target`` on ``key``: update matched,
    insert unmatched, drop flagged. Change keys must be unique (callers
    with multi-row batches reduce to the winning row first — see
    ``scd2_apply`` for the latest-per-key pattern). Returns the new
    snapshot with ``target``'s columns."""
    data_cols = [c for c in target.columns if c != key]
    flag = (
        F.coalesce(F.col(delete_flag), F.lit(False))
        if delete_flag in changes.columns
        else F.lit(False)
    )
    ch = changes.select(
        key,
        *data_cols,
        flag.alias("_del"),
        F.lit(True).alias("_has_chg"),
    )
    tg = target.select(
        key,
        *[F.col(c).alias(f"_t_{c}") for c in data_cols],
        F.lit(True).alias("_has_tgt"),
    )
    j = tg.join(ch, key, "full_outer")
    has_chg = F.coalesce(F.col("_has_chg"), F.lit(False))
    return j.filter(~F.coalesce(F.col("_del"), F.lit(False))).select(
        F.col(key),
        *[
            F.when(has_chg, F.col(c)).otherwise(F.col(f"_t_{c}")).alias(c)
            for c in data_cols
        ],
    )
