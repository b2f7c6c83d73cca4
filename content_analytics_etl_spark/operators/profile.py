"""Profile aggregation operators (SURVEY.md §2.3 A1-A4, §2.4 J1).

The reference builds one wide row per contract: per-category summed
durations (group-sum + pivot) joined with a device count. Generalized
here over any (key, category, measure) triple. Scale notes:

- ``pivot`` always takes the **explicit value list** — the reference's
  dynamic pivot (``ETL_full.py:63``) costs an extra distinct-collect job
  and produces a data-dependent schema that crashes its own downstream
  ``greatest`` when a category is absent (SURVEY §7 "hard parts").
- Both aggregation branches and the join shuffle on the same key, so
  Catalyst reuses the exchange; no manual repartition needed.
- Device count exposes BOTH semantics: the reference's row-count quirk
  (A3: counts log rows, ``ETL_full.py:42-45``) and the corrected
  ``countDistinct`` — callers choose fidelity vs. fixed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["count_devices", "sum_by_category", "pivot_profile", "attach_device_count"]


def count_devices(
    df: DataFrame,
    key: str = "Contract",
    device_col: str = "Mac",
    *,
    distinct: bool = False,
    out_col: str = "TotalDevices",
) -> DataFrame:
    """A3. ``distinct=False`` reproduces the reference quirk (row count,
    not device count — ``ETL_full.py:42-45``); ``distinct=True`` is the
    corrected ``countDistinct(device_col)``. At 100 TB-scale cardinality,
    swap countDistinct for ``approx_count_distinct`` (HLL) — exposed by
    the caller, not hard-coded here, because it changes results."""
    agg = (
        F.countDistinct(device_col) if distinct else F.count(F.lit(1))
    ).alias(out_col)
    return df.select(key, device_col).groupBy(key).agg(agg)


def sum_by_category(
    df: DataFrame,
    key: str,
    category: str,
    measure: str,
    *,
    out_col: str | None = None,
) -> DataFrame:
    """A1/A2 with the P7 rename folded into the agg alias (the reference
    renames ``sum(TotalDuration)`` after the fact — ``ETL_full.py:62``)."""
    return df.groupBy(key, category).agg(F.sum(measure).alias(out_col or measure))


def pivot_profile(
    df: DataFrame,
    key: str,
    category: str,
    measure: str,
    categories: Sequence[str],
    *,
    fill: float | int | None = 0,
) -> DataFrame:
    """A4 + P8: long→wide pivot with an **explicit** category list (one
    column per category, stable schema, no discovery job), absent
    categories filled with ``fill`` (reference ``na.fill(0)``,
    ``ETL_full.py:63``). Pass ``fill=None`` to keep NULLs (the
    ``ETL_one_day.py:38`` variant)."""
    wide = df.groupBy(key).pivot(category, list(categories)).sum(measure)
    if fill is not None:
        wide = wide.na.fill(fill, subset=list(categories))
    return wide


def attach_device_count(profile: DataFrame, devices: DataFrame, key: str) -> DataFrame:
    """J1: USING-style inner equi-join (``ETL_full.py:67``). Both sides
    are aggregates of the same scan keyed identically, so the planner
    reuses the exchange; with AQE the small side goes broadcast."""
    return profile.join(devices, on=key, how="inner")
