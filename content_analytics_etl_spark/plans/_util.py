"""Shared helpers for query plans.

Float determinism policy: distributed SUM/AVG over doubles is
order-dependent (partial aggregation order differs run to run and engine
to engine), so any double aggregate that must hash-match the DuckDB
oracle is computed over an exact DECIMAL cast and converted back to
double at the end — bit-identical on both engines, independent of
partitioning:

    Spark : F.sum(col.cast('decimal(18,6)')).cast('double')
    DuckDB: CAST(SUM(CAST(col AS DECIMAL(18,6))) AS DOUBLE)

Per-row arithmetic on doubles (no reduction) is deterministic and needs
no such treatment.

Wide-decimal caveat: DuckDB casts int128-backed decimals to double in
two rounding steps (int128→double, then /10^scale), which can differ by
1 ULP from Spark's correctly-rounded BigDecimal cast once the value
exceeds ~16 significant digits. Oracles for such wide sums (e.g. the
second-moment sums in agg_stats) must round-trip through VARCHAR —
``CAST(CAST(SUM(...) AS VARCHAR) AS DOUBLE)`` — which parses correctly
rounded and matches the JVM bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

__all__ = ["t", "dsum", "davg", "dec"]

DEC = "decimal(18,6)"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a star-schema table with its declared schema."""
    return load_table(spark, sf_dir, name)


def dec(col: Column | str) -> Column:
    """Exact-decimal view of a double column (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent double SUM (decimal-exact internally)."""
    return F.sum(dec(col)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent double AVG: exact decimal sum ÷ count, divided
    as doubles (both engines do the identical IEEE division)."""
    c = dec(col)
    return (F.sum(c).cast("double") / F.count(c)).alias(alias)
