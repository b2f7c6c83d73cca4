"""Merge every plan module's QUERIES/ORACLES into the driver contract."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    analytics_queries,
    dedup_queries,
    multimodal_queries,
    events_queries,
    reference_queries,
    relational_queries,
    similarity_queries,
    temporal_queries,
    text_queries,
    tpch_deep_queries,
    tpch_queries,
)

_MODULES = [
    reference_queries,
    relational_queries,
    tpch_queries,
    tpch_deep_queries,
    events_queries,
    analytics_queries,
    temporal_queries,
    text_queries,
    dedup_queries,
    similarity_queries,
    multimodal_queries,
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
