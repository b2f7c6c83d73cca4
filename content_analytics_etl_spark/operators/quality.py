"""Scan-time data-quality metrics via ``DataFrame.observe`` — the
Spark-native way to monitor a pipeline without a second pass.

The reference validates nothing (its malformed-JSON rows silently become
all-NULL rows — SURVEY.md §1.1); a production ingest needs row counts,
null-rates, and domain violations *observed on the same scan that feeds
the pipeline*. ``observe`` attaches accumulator-backed aggregates to the
plan: zero extra jobs, zero extra scans, metrics delivered after the
action completes. At 100 TB an extra validation pass is another full
read — this is free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

__all__ = ["observe_quality", "null_rate_metrics"]


def null_rate_metrics(cols: list[str]) -> list[Column]:
    """count + per-column null counts, as observe()-compatible
    aggregates (must be accumulator-expressible: no distinct)."""
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    metrics += [
        F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}") for c in cols
    ]
    return metrics


def observe_quality(
    df: DataFrame,
    *,
    null_cols: list[str] | None = None,
    extra: list[Column] | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach a quality observation to ``df``. Returns the instrumented
    frame and the Observation; read ``obs.get`` after the first action
    on the returned frame."""
    obs = Observation("quality")
    metrics = null_rate_metrics(null_cols or [])
    if extra:
        metrics += extra
    return df.observe(obs, *metrics), obs
