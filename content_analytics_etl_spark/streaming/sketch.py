"""Streaming distinct-count sketch maintenance (SURVEY.md §2.8 / §7
extension): the incremental twin of the batch
``events_distinct_sketch_rollup`` register table.

The insight the batch query materializes — LogLog registers are
(day, register, max-ρ) ROWS that merge with MAX — is exactly what makes
the sketch streamable with a plain watermarked aggregation: each
micro-batch folds its rows into the running per-day register maxima, so
state is |days-in-watermark| × 64 rows TOTAL regardless of event volume
(the 100 TB property: streaming distinct tracking with constant state
per day, no per-user state ever). A dashboard reads the register table
and applies the 2^mean estimator; any day range merges with one more
MAX aggregation, never a replay.

Expressions are shared with the batch side
(``functions/hashing.loglog_reg_rho`` — pure integer bit arithmetic),
so streaming ≡ batch equality is exact row equality, asserted in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import loglog_reg_rho
from ..plans.events_queries import LOGLOG_ALPHA, RHO_CAP, SKETCH_M

__all__ = [
    "sketch_registers",
    "estimate_from_registers",
    "quantile_sketch_bins",
]


def sketch_registers(
    events: DataFrame, *, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked per-(day, register) LogLog maxima over a stream.

    The day key MUST be ``window(ts, '1 day')`` — grouping by
    ``date_trunc('day', ts)`` looks equivalent but strips the
    event-time watermark metadata (only the watermarked column itself
    or a window over it carries it), so append mode would raise and
    state would never be evicted; the window form gives real
    ``|days-in-watermark| × 64``-row state and append-mode emission of
    finalized days. ``w.start`` equals the batch side's day-truncated
    timestamp (UTC session)."""
    r, rho = loglog_reg_rho("user_id", m=SKETCH_M, cap=RHO_CAP)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), r.alias("r"))
        .agg(F.max(rho).alias("mx"))
        .select(F.col("w.start").alias("day"), "r", "mx")
    )


def estimate_from_registers(regs: DataFrame, *groups: str) -> DataFrame:
    """Merge a register table (optionally across days: pass no groups)
    and apply the LogLog estimator — batch post-processing a dashboard
    runs over the streamed state."""
    keys = list(groups)
    merged = regs.groupBy(*keys, "r").agg(F.max("mx").alias("mx"))
    summed = (
        merged.groupBy(*keys).agg(F.sum("mx").alias("s"))
        if keys
        else merged.agg(F.sum("mx").alias("s"))
    )
    est = F.round(
        F.lit(LOGLOG_ALPHA * SKETCH_M)
        * F.pow(F.lit(2.0), F.col("s").cast("double") / F.lit(float(SKETCH_M))),
        6,
    )
    return summed.select(*keys, est.alias("est_users"))


def quantile_sketch_bins(
    events: DataFrame, *, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked per-(day, bin) histogram partials — the streaming
    twin of the batch quantile sketch
    (``plans/events_queries.qsketch_day_bins``): each micro-batch adds
    its rows into the running per-day 64-bin counts, so state is
    |days-in-watermark| × 64 rows regardless of event volume, and any
    day range's quantiles invert from the streamed state with the same
    ±bin-width bound — never a replay of raw events. Same
    ``window(ts, '1 day')`` watermark-carrying form as
    ``sketch_registers`` (see that docstring for why date_trunc would
    break append mode)."""
    from ..plans.events_queries import qsketch_bin

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), qsketch_bin().alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("w.start").alias("day"), "bin", "c")
    )
