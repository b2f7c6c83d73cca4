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

from pyspark.sql import DataFrame
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
    dimension rows."""
    out_cols = [key, *tracked, "valid_from", "valid_to", "is_current"]
    hist = dim.filter(~F.col("is_current")).select(*out_cols)
    cur = dim.filter(F.col("is_current")).select(
        F.col(key), *[F.col(c).alias(f"_cur_{c}") for c in tracked], "valid_from"
    )
    chg = changes.select(
        F.col(key), *[F.col(c).alias(f"_new_{c}") for c in tracked], ts_col
    )
    j = cur.join(chg, key, "full_outer")
    matched = F.col(ts_col).isNotNull() & F.col("valid_from").isNotNull()
    differs = F.lit(False)
    for c in tracked:
        differs = differs | ~F.col(f"_cur_{c}").eqNullSafe(F.col(f"_new_{c}"))

    kept = j.filter(~matched | ~differs).filter(F.col("valid_from").isNotNull()).select(
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
    opened = j.filter(F.col(ts_col).isNotNull() & (~matched | differs)).select(
        F.col(key),
        *[F.col(f"_new_{c}").alias(c) for c in tracked],
        F.col(ts_col).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return hist.unionByName(kept).unionByName(closed).unionByName(opened)
