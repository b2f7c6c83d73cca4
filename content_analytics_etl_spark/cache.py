"""Cache-lifetime discipline shared by plans and operators.

Lives at package root (not ``plans._util``) so low-level operators can
use it without importing the plans package, whose ``__init__`` pulls in
the full query registry (a circular import from ``operators/*``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

__all__ = ["materialize_and_release", "session_materialized"]


def materialize_and_release(result: DataFrame, *intermediates: DataFrame) -> DataFrame:
    """Blocking materialize-then-unpersist: force ``result`` into its own
    (small) cache, then drop the large intermediate caches it was derived
    from. Iterative plans persist a working set that every unrolled round
    references; without this, each invocation leaks that cache for the
    session lifetime (bench/correctness sweeps run all queries in one
    session). After this call the only pinned storage is the final
    result, which the ContextCleaner reclaims once the DataFrame is
    garbage-collected."""
    out = result.persist()
    out.count()
    for df in intermediates:
        df.unpersist()
    return out


# One materialization per (session, logical key). Registered queries that
# feed OTHER registered queries (cluster assignments, per-doc LM scores,
# the curation manifest) would otherwise re-execute their full pipeline
# once per consumer in a single sweep — at 100 TB these are incremental
# tables written once per corpus snapshot, and this cache is the local
# stand-in for that posture. Callers put the corpus content fingerprint
# in the key so regenerated data recomputes; entries die with the
# application (keyed by applicationId).
_SESSION_CACHE: dict[tuple[str, str], DataFrame] = {}


def session_materialized(
    spark: SparkSession, key: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return the session's materialization of ``build()`` for ``key``,
    building + persisting + counting it on first use."""
    k = (spark.sparkContext.applicationId, key)
    df = _SESSION_CACHE.get(k)
    if df is None:
        df = build().persist()
        df.count()
        _SESSION_CACHE[k] = df
    return df
