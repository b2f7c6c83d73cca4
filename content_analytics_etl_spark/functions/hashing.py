"""Portable deterministic hashing.

``xxhash64``/``hash`` differ between engines, so operators whose results
must be reproducible anywhere (fingerprints, MinHash signatures, LSH
buckets) use an md5-derived 64-bit integer instead: the top 15 hex chars
of md5 as a bigint (60 bits, positive). Identical in Spark
(``conv(substr(md5(x),1,15),16,10)``) and DuckDB
(``('0x' || substr(md5(x),1,15))::BIGINT``) — verified bit-for-bit.

md5 here is a content fingerprint for dedup bucketing, not a security
primitive. In a pure-Spark deployment ``xxhash64`` is ~5× faster and is
the right choice when cross-engine reproducibility doesn't matter; these
helpers deliberately trade that speed for verifiability.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["portable_hash64", "md5_fingerprint", "DUCKDB_HASH64", "loglog_reg_rho"]

# DuckDB-side template of portable_hash64; format with the input SQL expr.
DUCKDB_HASH64 = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def portable_hash64(col: Column | str, seed: str | None = None) -> Column:
    """60-bit non-negative integer hash of a string column, optionally
    salted with a seed (for MinHash's k independent hash functions)."""
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(seed + "|"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def md5_fingerprint(col: Column | str) -> Column:
    """Full 128-bit content fingerprint (hex string)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def loglog_reg_rho(
    col: Column | str, *, m: int = 64, cap: int = 55
) -> tuple[Column, Column]:
    """(register, ρ) columns of the Durand-Flajolet LogLog sketch over
    the portable 60-bit hash: register = low log2(m) bits, ρ = 1-based
    index of the lowest set bit of the remaining 54 (``cap`` when they
    are all zero). Pure integer bit arithmetic — no transcendental, so
    the same rows produce the same registers on any engine; used by the
    batch rollup (plans/events_queries.py) and its streaming twin
    (streaming/sketch.py)."""
    c = F.col(col) if isinstance(col, str) else col
    h = portable_hash64(c.cast("string"))
    rest = F.shiftright(h, 6)
    rho = (
        F.when(rest == 0, F.lit(cap))
        .otherwise(F.bit_count(rest.bitwiseAND(-rest) - 1) + 1)
        .cast("int")
    )
    return h.bitwiseAND(m - 1), rho
