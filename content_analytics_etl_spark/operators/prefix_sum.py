"""Distributed two-pass prefix sum (running total / global rank) —
the scalable replacement for ``sum(x).over(Window.orderBy(...))`` with
no ``partitionBy``, which Spark executes as a SINGLE-partition exchange
(every row through one task; the scale anti-pattern
``tools/audit_plans.py`` flags).

The classic MPP algorithm:

1. the caller derives a DETERMINISTIC partition id ``pid`` from the
   data itself (a calendar bucket, a quantile bucket from literal
   boundaries, ...) that is MONOTONE in the global sort order — every
   row of pid p sorts before every row of pid p+1;
2. pass 1 aggregates per-pid totals and row counts — an O(#pids)
   control-plane collect, never data — and turns them into exclusive
   prefix offsets;
3. pass 2 computes per-pid local running sums / row numbers with a
   window PARTITIONED BY pid (each task holds one pid's slice, not the
   world) and adds the broadcast offsets.

Because the summed values are integers (callers pass fixed-point
``bigint`` columns), addition is associative and ``offset + local`` is
bit-identical to the global running fold a single-threaded oracle
computes.

Determinism matters beyond tidiness: the previous implementation tagged
rows with ``spark_partition_id()`` after ``repartitionByRange``, whose
boundary SAMPLING can differ between evaluations — on executor loss a
recomputed partition could silently receive different pids between the
offsets pass and the window pass (ADVICE r5). A pid computed from row
values alone is reproducible under any recomputation, so the persist
below is purely a performance choice (avoid re-running the upstream
aggregate for both passes), never a correctness dependency.

At 100 TB: raise the caller's bucket count with the cluster; the
collect stays O(#buckets) and no task ever materializes more than one
bucket's rows. Skewed buckets behave like any skewed aggregation key
(AQE splits the shuffle read; the window sort is per-bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..cache import materialize_and_release

_PID = "__psum_pid"


_IEEE_SUB_BITS = 5
_IEEE_SENTINEL = -(1 << 40)  # all non-positive / NULL / NaN values


def ieee_bucket_asc(col: str, sub_bits: int = _IEEE_SUB_BITS) -> Column:
    """Deterministic ascending-order bucket id for a POSITIVE numeric
    column, derived from the IEEE-754 binade structure of the value —
    pid = binade_exponent · 2^(sub_bits+2) + top-``sub_bits`` mantissa
    bits.  Monotone non-decreasing in the value (the r15 replacement
    for ``quantile_bucket_asc`` at call sites whose order key is the
    bucketed column): the binade exponent is monotone, the scaled
    mantissa is monotone within a binade, and a ±1 exponent slop at an
    exact power of two (floor(log2) rounding) only shifts the value
    into the adjacent sub-range of the SAME composite ordering — the
    ·2^(sub_bits+2) stride leaves room for the slopped sub value, so
    the composite never decreases.  Equal values always share a bucket
    (pure function of the value).

    Unlike the quantile buckets this needs NO data pass — the
    per-invocation ``approxQuantile`` driver action (a full pass over
    the ranked relation) disappears from every prefix-sum query (guide
    §1.2 step 1 / §5: no driver round-trip, one fewer pass).  The
    trade is balance: buckets are equal-width in log-value rather than
    equal-count.  Uniform, lognormal and Zipf shapes all spread over
    ≥ 64 buckets with max-bucket share ≤ ~2 % except ties (measured in
    tests/test_round15_ops.py); tie-heavy columns collapse ties into
    one bucket exactly as quantile boundaries did.  Values ≤ 0 / NULL
    / NaN all land in one sentinel bucket BELOW every positive bucket
    — monotone as long as the order direction puts them first (callers
    here have strictly positive keys; the sentinel is defensive).

    At 100 TB the collect stays O(#binades · 2^sub_bits) ≤ ~4k rows
    for the full double range — same control-plane contract as the
    quantile form."""
    x = F.col(col).cast("double")
    e = F.greatest(
        F.lit(-1074.0), F.least(F.lit(1024.0), F.floor(F.log2(x)))
    )
    sub = F.least(
        F.lit(float((1 << (sub_bits + 2)) - 1)),
        F.floor(x * F.pow(F.lit(2.0), F.lit(float(sub_bits)) - e)),
    )
    pid = (
        e.cast("long") * F.lit(1 << (sub_bits + 2)) + sub.cast("long")
    )
    return F.when(
        x.isNull() | F.isnan(x) | (x <= 0.0), F.lit(_IEEE_SENTINEL)
    ).otherwise(pid)


def ieee_bucket_desc(col: str, sub_bits: int = _IEEE_SUB_BITS) -> Column:
    """Descending twin of :func:`ieee_bucket_asc` (pid 0-ish holds the
    largest values): the negated ascending bucket — monotone
    non-decreasing along the value DESCENDING, non-positive/NULL/NaN
    values in one sentinel bucket ABOVE every positive bucket (they
    sort last descending)."""
    return -ieee_bucket_asc(col, sub_bits)


def quantile_bucket_desc(
    df: DataFrame, col: str, num_buckets: int, rel_err: float = 0.001
) -> Column:
    """Deterministic descending-order bucket id for ``col``: boundaries
    come from one driver-side ``approxQuantile`` pass, embedded as
    LITERALS, so the per-row bucket expression is a pure function of the
    row — pid 0 holds the largest values. Equal values always share a
    bucket (pid = count of boundaries strictly greater), so any
    tie-break ordering stays intact within one bucket."""
    probs = [i / num_buckets for i in range(1, num_buckets)]
    bounds = df.stat.approxQuantile(col, probs, rel_err)
    barr = F.array(*[F.lit(float(b)) for b in sorted(bounds, reverse=True)])
    return F.size(F.filter(barr, lambda b: b > F.col(col)))


def quantile_bucket_asc(
    df: DataFrame, col: str, num_buckets: int, rel_err: float = 0.001
) -> Column:
    """Ascending twin of :func:`quantile_bucket_desc`: pid 0 holds the
    SMALLEST values (pid = count of boundaries strictly below the row's
    value), monotone non-decreasing along ``col`` ascending — the pid
    contract for prefix sums ordered low→high (Gini / Lorenz-curve
    shapes). Equal values always share a bucket."""
    probs = [i / num_buckets for i in range(1, num_buckets)]
    bounds = df.stat.approxQuantile(col, probs, rel_err)
    barr = F.array(*[F.lit(float(b)) for b in sorted(bounds)])
    return F.size(F.filter(barr, lambda b: b < F.col(col)))


def distributed_prefix_sum(
    spark: SparkSession,
    df: DataFrame,
    *,
    pid: Column,
    order: list[Column],
    value_col: str,
    cum_col: str,
    rank_col: str | None = None,
) -> tuple[DataFrame, int]:
    """Attach a global running sum of integer ``value_col`` (and
    optionally a global row number) to ``df``, ordered by ``order``.

    ``pid`` must be a deterministic integer expression over the row,
    monotone NON-DECREASING along ``order`` (see module docstring).
    Returns ``(frame, grand_total)``; the frame is returned through
    ``materialize_and_release`` (persisted, with the tagged intermediate
    released), so the only pinned storage is the small result, which the
    ContextCleaner reclaims once the caller's DataFrame is
    garbage-collected — repeated calls in one session (bench /
    correctness sweeps) do not accumulate caches. ``rank_col`` is a
    BIGINT global row number (a 32-bit rank overflows past ~2.1B rows —
    well inside a 100 TB corpus); callers whose domain is provably small
    may downcast. The window partitions by the pid COLUMN, so hash
    collisions of several pids into one physical partition are
    harmless."""
    tagged = (
        df.withColumn(_PID, pid.cast("long"))
        .repartition(F.col(_PID))
        .persist()
    )
    stats = (
        tagged.groupBy(_PID)
        .agg(F.sum(value_col).alias("s"), F.count(F.lit(1)).alias("c"))
        .orderBy(_PID)
        .collect()
    )
    total = sum(r["s"] for r in stats)
    rows, acc_s, acc_c = [], 0, 0
    for r in stats:
        rows.append((r[_PID], acc_s, acc_c))
        acc_s += r["s"]
        acc_c += r["c"]
    # long pid: composite (group-index · stride + ieee bucket) pids
    # exceed int32 once the stride leaves room for the full ieee range
    offsets = spark.createDataFrame(
        rows, f"{_PID} long, __psum_off long, __psum_off_rank long"
    )
    w = W.partitionBy(_PID).orderBy(*order)
    out = tagged.withColumn(
        "__psum_local",
        F.sum(value_col).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    if rank_col is not None:
        out = out.withColumn("__psum_rn", F.row_number().over(w))
    out = out.join(F.broadcast(offsets), _PID).withColumn(
        cum_col, F.col("__psum_local") + F.col("__psum_off")
    )
    if rank_col is not None:
        out = out.withColumn(
            rank_col, F.col("__psum_rn") + F.col("__psum_off_rank")
        )
    out = out.drop(
        _PID, "__psum_local", "__psum_off", "__psum_off_rank", "__psum_rn"
    )
    # r15 note: a caller-managed lazy mode (skip this persist+count,
    # release tagged with the caller's terminal materialization) was
    # tried for graph_negative_samples and measured WORSE in an
    # interleaved same-session A/B (min 4.7 -> 6.3 s: the result
    # persist + double window re-evaluation outweigh the saved count
    # job) — the eager materialization below is the measured-best shape.
    return materialize_and_release(out, tagged), total
