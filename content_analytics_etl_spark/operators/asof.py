"""As-of (backward) join — an operator Spark lacks natively.

The reference has no temporal joins at all (SURVEY.md §2.4: one inner
equi-join); this is the §7 extension surface for event-time analytics.

Implementation is the union+window composition (SURVEY.md §2 "custom
operators: composition of existing DataFrame ops first"):

1. Tag right rows side=0, left rows side=1, union by name.
2. One window per join-key group ordered by (ts, side, tie-break):
   ``last(value, ignorenulls=True)`` over rows unbounded-preceding →
   every left row sees the latest right value at-or-before its
   timestamp (side=0 sorts first, so an equal-timestamp right row IS
   visible — standard backward-asof inclusive semantics).
3. Keep side=1 rows.

Scale shape: ONE shuffle on the join keys + ONE sort — identical cost
to any windowed aggregation, no per-key driver loops, no range
explosion. Skewed keys fall under AQE's skew handling like any other
window. (A pandas ``merge_asof`` via ``applyInPandas`` is the
alternative when the right side carries many value columns; this
expression form keeps everything JVM-side.)

Determinism: among right rows with equal (keys, ts) the one with the
largest ``right_tiebreak`` wins — both engines order identically, so
results are oracle-reproducible (DuckDB's bare ASOF JOIN is NOT
deterministic under timestamp ties, which is why the oracle mirrors
this window form instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["asof_join_backward", "asof_join_forward"]


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_value_cols: list[str],
    right_tiebreak: str,
) -> DataFrame:
    """Attach to each ``left`` row the latest ``right`` values with
    ``right.ts_col <= left.ts_col`` per ``on`` group (NULL when no such
    row). Output = all ``left`` columns + ``right_value_cols``.

    Row-atomic: the right value columns are packed into ONE struct and
    ``last(struct, ignorenulls=True)`` picks the matched right ROW —
    a NULL field in the matched row stays NULL (never backfilled from
    an older row) and all value columns come from the same right row.
    The struct itself is non-null for every right row, so null-skipping
    only skips the left rows interleaved by the union."""
    r = right.select(
        *on,
        ts_col,
        F.col(right_tiebreak).alias("_tb"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_value_cols]).alias("_rv"),
    )
    l = left.select("*", F.lit(None).cast("long").alias("_tb"), F.lit(1).alias("_side"))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        W.partitionBy(*on)
        .orderBy(ts_col, "_side", F.col("_tb").asc_nulls_last())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = u.select("*", F.last("_rv", ignorenulls=True).over(w).alias("_asof"))
    return filled.filter(F.col("_side") == 1).select(
        *left.columns,
        *[F.col(f"_asof.{c}").alias(c) for c in right_value_cols],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_value_cols: list[str],
    right_tiebreak: str,
) -> DataFrame:
    """Attach to each ``left`` row the EARLIEST ``right`` values with
    ``right.ts_col >= left.ts_col`` per ``on`` group (NULL when no such
    row) — the forward twin of :func:`asof_join_backward`.

    Same union+window composition, but ordered by ``ts`` DESCENDING so
    the nearest at-or-after right row is the last non-null value in a
    running unbounded-preceding frame — an O(n) streaming frame, NOT the
    O(n²) per-row re-scan a (currentRow, unboundedFollowing) frame would
    cost. Among right rows tied on (keys, ts) the smallest
    ``right_tiebreak`` wins (they sort by ``_tb`` desc, so it is the
    last seen). Row-atomic via the same struct pack as the backward
    form."""
    r = right.select(
        *on,
        ts_col,
        F.col(right_tiebreak).alias("_tb"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_value_cols]).alias("_rv"),
    )
    l = left.select("*", F.lit(None).cast("long").alias("_tb"), F.lit(1).alias("_side"))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        W.partitionBy(*on)
        .orderBy(F.col(ts_col).desc(), "_side", F.col("_tb").desc_nulls_last())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = u.select("*", F.last("_rv", ignorenulls=True).over(w).alias("_asof"))
    return filled.filter(F.col("_side") == 1).select(
        *left.columns,
        *[F.col(f"_asof.{c}").alias(c) for c in right_value_cols],
    )
