"""Cache-lifetime discipline shared by plans and operators.

Lives at package root (not ``plans._util``) so low-level operators can
use it without importing the plans package, whose ``__init__`` pulls in
the full query registry (a circular import from ``operators/*``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["materialize_and_release"]


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
