"""Deduplication operators (BASELINE extension, SURVEY.md §7 Phase 3):
exact, n-gram Jaccard, MinHash+LSH, SimHash.

Spark-first design — every step is built-in expressions + joins:

- **Exact**: fingerprint (md5 of normalized text) → groupBy. One shuffle
  on the fingerprint; at 100 TB this is the cheapest possible dedup
  (compact keys, map-side combine).
- **N-gram Jaccard**: distinct word-shingle arrays, pair generation
  restricted to a blocking key, ``array_intersect``/``array_union``
  sizes. Quadratic only within a block — at scale the blocking key is
  what makes it feasible (and MinHash-LSH replaces blocking entirely).
- **MinHash+LSH**: k portable 64-bit hashes (functions/hashing.py) per
  shingle set → signature; signatures cut into b bands of r rows; docs
  sharing any band key become candidates (equi-join on the band key — a
  *linear* shuffle, no quadratic pair scan); candidates verified with
  true Jaccard. k=16, b=4, r=4 targets the s-curve threshold
  (1/b)^(1/r) ≈ 0.7.
- **SimHash**: 60-bit signature; per-bit majority vote over feature
  hashes, pairs within hamming distance via xor+bit_count. Features
  should be shingles (not raw tokens) when the corpus vocabulary is
  small, or every signature collapses to the same majority pattern.

All hashing is the md5-derived portable hash so results are
engine-reproducible (oracle-checkable); swap in ``xxhash64`` for a ~5×
cheaper signature when that doesn't matter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text_metrics import tokens

__all__ = [
    "word_shingles",
    "minhash_signature",
    "lsh_bands",
    "simhash60",
    "jaccard",
]

# Spark-SQL template of the portable 64-bit hash (functions/hashing.py).
_H64 = "CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def word_shingles(text_col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of normalized text. Empty array for
    docs shorter than n tokens (the sequence guard keeps Spark's
    descending-sequence quirk out)."""
    toks = tokens(text_col)
    make = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(make)
    )


def minhash_signature(shingles_col: str, k: int = 16) -> Column:
    """MinHash signature: sig[s] = min over shingles of hash_s(shingle),
    s = 0..k-1, as one nested higher-order expression (no UDF, no
    explode — signature computed in a single projection)."""
    h = _H64.format(expr="concat(cast(s AS string), '|', x)")
    return F.expr(
        f"transform(sequence(0, {k - 1}), "
        f"s -> array_min(transform({shingles_col}, x -> {h})))"
    )


def lsh_bands(df: DataFrame, sig_col: str, id_col: str, bands: int, rows: int) -> DataFrame:
    """Explode a signature into (id, band_idx, band_key) rows — the LSH
    bucket relation. Joining this with itself on (band_idx, band_key)
    yields candidate pairs with a linear shuffle."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    ",", *[F.col(sig_col)[b * rows + r] for r in range(rows)]
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return df.select(id_col, F.explode(band_structs).alias("band")).select(
        id_col, "band.band_idx", "band.band_key"
    )


def simhash60(features_col: str) -> Column:
    """60-bit SimHash: per-bit majority vote over distinct-feature hashes.

    Single fold expression: the feature array is hashed ONCE (fold input),
    the accumulator is a 60-counter vector updated per hash, and the
    finish lambda packs the majority votes into a bigint. Hashing in the
    fold input (not per bit) keeps the md5 cost at O(features), not
    O(features × 60). 60 bits (not 64) keeps the signature inside the
    positive bigint range on every engine — no sign-bit semantics to
    reconcile."""
    h = _H64.format(expr="x")
    return F.expr(
        f"""aggregate(
              transform({features_col}, x -> {h}),
              array_repeat(0L, 60),
              (acc, hv) -> zip_with(acc, sequence(0, 59),
                             (a, b) -> a + (CAST(shiftright(hv, b) & 1 AS BIGINT) * 2 - 1)),
              acc -> aggregate(zip_with(acc, sequence(0, 59),
                                 (v, b) -> IF(v > 0, shiftleft(1L, b), 0L)),
                               0L, (s, x) -> s + x))"""
    )


def jaccard(a: Column | str, b: Column | str) -> Column:
    """Jaccard similarity of two distinct-element arrays."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.size(F.array_intersect(ca, cb)).cast("double") / F.size(
        F.array_union(ca, cb)
    ).cast("double")
