"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.8 extension — the escape hatch for semantics the built-in
windowed aggregations can't express).

Demonstrator: per-user running totals that persist across micro-batches
(emit one updated row per user per batch). State is one (count, total)
pair per user — bounded by user cardinality, partitioned by the groupBy
key, so it scales horizontally like any keyed state store.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_user_totals"]

_OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (n, total) = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Cumulative per-user event count + value total across the whole
    stream lifetime (not windowed — precisely what windowed aggs can't
    express without retraction)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
