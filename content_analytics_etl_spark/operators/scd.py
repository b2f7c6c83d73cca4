"""Slowly-changing-dimension type-2 upsert — the warehouse dimension-
maintenance operator (absent from the reference, which has no notion of
history; BASELINE warehouse surface).

Spark has no MERGE over plain parquet, so the operator expresses the
upsert relationally: one full-outer join of the *current* slice against
the change set, then three branch projections unioned with the untouched
history. ONE shuffle on the business key; history rows never move.
At 100 TB the dimension is partitioned by key-hash and the change set is
usually small enough to broadcast — both sides of the join then
co-locate and even the one shuffle disappears.

Output contract: the full new snapshot — closed-out versions get
``valid_to = change_ts`` and ``is_current = false``; new versions open at
``change_ts`` with ``valid_to = NULL``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["scd2_apply"]


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    *,
    key: str,
    tracked: list[str],
    ts_col: str = "change_ts",
) -> DataFrame:
    """Apply ``changes`` (key, tracked attrs, ts_col) to an SCD2
    ``dim`` snapshot (key, tracked attrs, valid_from, valid_to,
    is_current). A change whose tracked attributes equal the current
    version is a no-op. Unmatched change keys insert brand-new
    dimension rows.

    Robustness contract: ``changes`` may carry several rows per key —
    they are pre-reduced to the LATEST row per key (by ts_col desc,
    tracked attrs as a deterministic tie-break) inside the operator, so
    one current version is closed and one new version opened per key
    (intermediate same-batch versions are not fabricated).
    Matched-ness is carried by explicit presence flags from each join
    side, never inferred from the nullability of data columns — a
    current row with a NULL ``valid_from`` is preserved, not dropped."""
    out_cols = [key, *tracked, "valid_from", "valid_to", "is_current"]
    hist = dim.filter(~F.col("is_current")).select(*out_cols)
    cur = dim.filter(F.col("is_current")).select(
        F.col(key),
        *[F.col(c).alias(f"_cur_{c}") for c in tracked],
        "valid_from",
        F.lit(True).alias("_has_cur"),
    )
    latest = W.partitionBy(key).orderBy(
        F.col(ts_col).desc_nulls_last(), *[F.col(c).desc_nulls_last() for c in tracked]
    )
    chg = (
        changes.withColumn("_rn", F.row_number().over(latest))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(key),
            *[F.col(c).alias(f"_new_{c}") for c in tracked],
            ts_col,
            F.lit(True).alias("_has_chg"),
        )
    )
    j = cur.join(chg, key, "full_outer")
    has_cur = F.coalesce(F.col("_has_cur"), F.lit(False))
    has_chg = F.coalesce(F.col("_has_chg"), F.lit(False))
    matched = has_cur & has_chg
    differs = F.lit(False)
    for c in tracked:
        differs = differs | ~F.col(f"_cur_{c}").eqNullSafe(F.col(f"_new_{c}"))

    kept = j.filter(has_cur & (~matched | ~differs)).select(
        F.col(key),
        *[F.col(f"_cur_{c}").alias(c) for c in tracked],
        "valid_from",
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    closed = j.filter(matched & differs).select(
        F.col(key),
        *[F.col(f"_cur_{c}").alias(c) for c in tracked],
        "valid_from",
        F.col(ts_col).alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = j.filter(has_chg & (~matched | differs)).select(
        F.col(key),
        *[F.col(f"_new_{c}").alias(c) for c in tracked],
        F.col(ts_col).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return hist.unionByName(kept).unionByName(closed).unionByName(opened)
