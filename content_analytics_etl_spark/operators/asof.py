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

__all__ = ["asof_join_backward", "asof_join_forward", "asof_join_nearest"]


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


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_value_cols: list[str],
    right_tiebreak: str,
    matched_ts_col: str | None = None,
) -> DataFrame:
    """Attach to each ``left`` row the ``right`` values whose timestamp
    is NEAREST (either direction) per ``on`` group; backward wins exact
    distance ties (pandas ``merge_asof(direction='nearest')``
    semantics). ``matched_ts_col``, when given, also emits the matched
    right row's timestamp (callers derive match direction from it).

    One union, ONE shuffle on the join keys, TWO window passes over the
    same partitioning (ascending for the backward candidate, descending
    for the forward candidate — the second window needs only a re-sort,
    never a second exchange; both frames are O(n) running
    unbounded-preceding, not the O(n²) unbounded-following form). The
    matched right timestamp rides inside the packed struct, so the
    distance comparison and every value column are row-atomic."""
    r = right.select(
        *on,
        ts_col,
        F.col(right_tiebreak).alias("_tb"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(ts_col).alias("_rts"),
            *[F.col(c) for c in right_value_cols],
        ).alias("_rv"),
    )
    l = left.select("*", F.lit(None).cast("long").alias("_tb"), F.lit(1).alias("_side"))
    u = l.unionByName(r, allowMissingColumns=True)
    wb = (
        W.partitionBy(*on)
        .orderBy(ts_col, "_side", F.col("_tb").asc_nulls_last())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy(*on)
        .orderBy(F.col(ts_col).desc(), "_side", F.col("_tb").desc_nulls_last())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = u.select(
        "*",
        F.last("_rv", ignorenulls=True).over(wb).alias("_b"),
        F.last("_rv", ignorenulls=True).over(wf).alias("_f"),
    )
    d_back = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("_b._rts"))
    d_fwd = F.unix_micros(F.col("_f._rts")) - F.unix_micros(F.col(ts_col))
    pick = (
        F.when(F.col("_f").isNull(), F.col("_b"))
        .when(F.col("_b").isNull(), F.col("_f"))
        .when(d_back <= d_fwd, F.col("_b"))
        .otherwise(F.col("_f"))
    )
    out = filled.filter(F.col("_side") == 1).select(
        *left.columns,
        pick.alias("_asof"),
    )
    extra = (
        [F.col("_asof._rts").alias(matched_ts_col)] if matched_ts_col else []
    )
    return out.select(
        *left.columns,
        *[F.col(f"_asof.{c}").alias(c) for c in right_value_cols],
        *extra,
    )
