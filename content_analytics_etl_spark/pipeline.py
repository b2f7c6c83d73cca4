"""The viewing-log ETL pipeline, end-to-end (SURVEY.md §3 entry point 1).

Re-expression of the reference's canonical pipeline
(``ETL_full.py:152-173``: read → ETL_process → OLAP_process → save)
with its scale problems fixed:

- explicit schema (no inference scan);
- explicit pivot values (no discovery job, stable schema — downstream
  ``greatest`` can't crash on a missing category);
- one cached flattened frame per run (the reference re-executes the whole
  DAG per action — SURVEY §3 step 4);
- ``coalesce(1)`` CSV for small outputs, partitioned parquet at scale.

``fidelity=True`` preserves the reference's observable quirks
(TotalDevices = log-row count, not distinct Macs — ``ETL_full.py:42-45``);
``fidelity=False`` is the corrected pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.olap import argmax_label, bucketize, taste_label
from .operators.profile import (
    attach_device_count,
    count_devices,
    pivot_profile,
    sum_by_category,
)
from .operators.recode import VIEWING_CATEGORIES, VIEWING_CATEGORY_MAP, recode_category

__all__ = ["etl_process", "olap_process", "run_viewing_pipeline"]

# most_watch label map — column → label, in the reference's tie-break
# order Child > Movie > Relax > Sport > TV (ETL_full.py:101-107).
_MOST_WATCH = {
    "ChildDuration": "Child",
    "MovieDuration": "Movie",
    "RelaxDuration": "Relax",
    "SportDuration": "Sport",
    "TVDuration": "TV",
}

SECONDS_PER_DAY = 86400  # ETL_full.py:131


def etl_process(flat: DataFrame, *, fidelity: bool = True) -> DataFrame:
    """Flattened log rows → one wide row per Contract.

    Mirrors ``ETL_process`` (``ETL_full.py:74-90``): device count off the
    pre-recode frame (branch A), recode → filters → group-sum → pivot
    (branch B), inner join on Contract.
    """
    devices = count_devices(flat, "Contract", "Mac", distinct=not fidelity)
    recoded = flat.withColumn("Type", recode_category("AppName", VIEWING_CATEGORY_MAP))
    filtered = recoded.filter(
        (F.col("Contract") != "0") & (F.col("Type") != "Error")
    )  # P3 (sentinel; NULL contracts drop via 3VL) + P4
    stats = sum_by_category(filtered, "Contract", "Type", "TotalDuration")
    wide = pivot_profile(
        stats, "Contract", "Type", "TotalDuration", VIEWING_CATEGORIES, fill=0
    )
    return attach_device_count(wide, devices, "Contract")


def olap_process(profile: DataFrame) -> DataFrame:
    """Wide profile → +most_watch, +Taste, +Active_day
    (``OLAP_process``, ``ETL_full.py:140-150``)."""
    total_secs = sum(F.col(c) for c in _MOST_WATCH)
    return (
        profile.withColumn("most_watch", argmax_label(_MOST_WATCH))
        .withColumn("Taste", taste_label(_MOST_WATCH))
        .withColumn("TotalDays", total_secs / SECONDS_PER_DAY)
        .withColumn("Active_day", bucketize("TotalDays", [10, 20], ["Low", "Medium", "High"]))
        .drop("TotalDays")
    )


def run_viewing_pipeline(flat: DataFrame, *, fidelity: bool = True) -> DataFrame:
    """Full pipeline over an already-flattened log frame. Caching the
    input is the caller's choice (do it when the same run also computes
    other branches)."""
    return olap_process(etl_process(flat, fidelity=fidelity))
