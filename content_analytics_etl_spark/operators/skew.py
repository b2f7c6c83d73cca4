"""Skew mitigation by key salting (SURVEY.md §7 scale discipline;
the reference never handles skew — its only physical choice is
``repartition(1)``, SURVEY §2.9 X1).

AQE's skew-join splitting (on in ``session.py``) already repairs skewed
sort-merge joins at runtime; manual salting remains the right tool
when:

- the skewed side feeds a *shuffled hash* join or an aggregation whose
  single hot key saturates one reducer, or
- the join must stay broadcast-free and deterministic in shape
  (e.g. inside Structured Streaming, where AQE doesn't re-plan).

``salted_join``: the skewed (large) side gets ``salt =
pmod(xxhash64(salt_from), n)``; the small side is replicated n times;
the join key becomes (key, salt). Each hot key spreads over n reducers
at the cost of an n× duplication of the small side — bounded,
tunable, and the result is row-for-row identical to the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt_from: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the large side's hot keys spread over
    ``n_salts`` reducers. ``salt_from`` is any large-side column with
    per-row variety (a unique id is ideal); the salt is derived, never
    random, so runs are reproducible. Output columns = the unsalted
    join's columns."""
    salted_large = large.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)).cast("int")
    )
    replicated_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_large.join(replicated_small, [on, "_salt"], how).drop("_salt")
