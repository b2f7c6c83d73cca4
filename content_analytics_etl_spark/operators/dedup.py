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
- **MinHash+LSH**: explode shingles → ONE portable md5 hash per shingle
  → k universal hashes ``(a_s·h + b_s) mod p`` (p = 2³¹−1, cheap int
  arithmetic) → ``groupBy(min×k)`` signature → signatures cut into b
  bands of r rows; docs sharing any band key become candidates
  (equi-join on the band key — a *linear* shuffle, no quadratic pair
  scan); candidates verified with true Jaccard. k=16, b=4, r=4 targets
  the s-curve threshold (1/b)^(1/r) ≈ 0.7.
- **SimHash**: 60-bit signature; per-bit majority vote over feature
  hashes as 60 codegen'd conditional sums over the exploded relation,
  pairs within hamming distance via xor+bit_count.

Why explode→aggregate instead of per-row higher-order lambdas: Spark's
higher-order functions (``transform``/``aggregate``) are CodegenFallback
— interpreted per element — and Catalyst's CollapseProject will inline a
signature expression into every downstream reference (16 band columns ×
16-seed signature × per-shingle md5 ⇒ multiplicative re-evaluation).
An Aggregate is a hard boundary no projection collapses across, the
conditional sums/mins are whole-stage-codegen'd, and partial (map-side)
aggregation makes the shuffle carry one row per doc, not per shingle.

All hashing is the md5-derived portable hash so results are
engine-reproducible (oracle-checkable); swap in ``xxhash64`` for a ~5×
cheaper base hash when that doesn't matter.
"""

from __future__ import annotations

import random
from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64
from ..functions.text_metrics import tokens

__all__ = [
    "word_shingles",
    "shingle_rows",
    "shingled",
    "shingle_hashes",
    "minhash_signature_agg",
    "lsh_band_keys",
    "simhash60",
    "simhash60_agg",
    "jaccard",
    "MINHASH_P",
    "MINHASH_A",
    "MINHASH_B",
]

# Universal-hash family for MinHash: h_s(x) = (a_s·x + b_s) mod p over
# x ∈ [0, 2³¹); products stay < 2⁶² so the arithmetic is overflow-free
# 64-bit in every engine. Constants fixed by seed ⇒ reproducible.
MINHASH_P = 2147483647  # 2³¹ − 1 (Mersenne prime)
_rng = random.Random(20260813)
MINHASH_A = [_rng.randrange(1, MINHASH_P) for _ in range(64)]
MINHASH_B = [_rng.randrange(0, MINHASH_P) for _ in range(64)]


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


def shingle_rows(
    docs: DataFrame,
    id_cols: list[str],
    text_col: str = "text",
    n: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """(id..., shingle) rows built relationally: posexplode tokens →
    window ``lead`` n-gram assembly → optional distinct.

    This is the scale path for every shingle consumer. The array-lambda
    form (:func:`word_shingles`) is CodegenFallback — ~40µs/element
    interpreted — while this shape is whole-stage-codegen end to end:
    one generator, one window (shuffle+sort on the doc id, which also
    spreads single-file scans across the cluster), one optional
    distinct. Docs with < n tokens vanish (the last ``lead`` is NULL for
    every position), matching ``word_shingles``'s empty-array-then-
    filter semantics. Set ``distinct=False`` for duplicate-insensitive
    consumers (MinHash: min over a multiset == min over its set)."""
    pe = docs.select(*id_cols, F.posexplode(tokens(text_col)).alias("pos", "tok"))
    w = Window.partitionBy(*id_cols).orderBy("pos")
    leads = [F.lead("tok", j).over(w) for j in range(1, n)]
    out = (
        pe.select(
            *id_cols,
            F.concat_ws(" ", F.col("tok"), *leads).alias("shingle"),
            leads[-1].isNotNull().alias("_full"),
        )
        .filter("_full")
        .drop("_full")
    )
    return out.distinct() if distinct else out


def shingled(
    docs: DataFrame,
    id_cols: list[str],
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(id..., shingles array) relation — :func:`shingle_rows` folded
    back into per-doc distinct-shingle arrays (collect_list after
    distinct ⇒ set semantics; order is nondeterministic, fine for the
    set-algebra consumers: ``array_intersect``/``array_union``)."""
    rows = shingle_rows(docs, id_cols, text_col, n, distinct=True)
    return rows.groupBy(*id_cols).agg(F.collect_list("shingle").alias("shingles"))


def shingle_hashes(rows: DataFrame, id_cols: list[str]) -> DataFrame:
    """Hash a (id..., shingle) relation: ``h`` is the portable 60-bit
    md5 hash — computed ONCE per shingle row, the only expensive hash in
    the whole dedup pipeline."""
    return rows.select(*id_cols, portable_hash64("shingle").alias("h"))


def minhash_signature_agg(
    hashed: DataFrame, id_cols: list[str], k: int = 16
) -> DataFrame:
    """MinHash signature as k aggregated columns ``mh0..mh{k-1}``:
    mh_s = min over shingles of (a_s·(h mod 2³¹) + b_s) mod p.

    One row per id after a partial+final hash aggregation — the shuffle
    carries k bigints per doc regardless of doc length."""
    base = F.col("h").bitwiseAND(F.lit(0x7FFFFFFF))
    aggs = [
        F.min((F.lit(MINHASH_A[s]) * base + F.lit(MINHASH_B[s])) % F.lit(MINHASH_P)).alias(
            f"mh{s}"
        )
        for s in range(k)
    ]
    return hashed.groupBy(*id_cols).agg(*aggs)


def lsh_band_keys(
    sig: DataFrame, id_cols: list[str], bands: int, rows: int
) -> DataFrame:
    """Stack a k-column signature into (id, band_idx, band_key) rows —
    the LSH bucket relation. Joining this with itself on
    (band_idx, band_key) yields candidate pairs with a linear shuffle.
    Column refs only (signature is materialized by the upstream
    aggregate), so no expression re-inlining."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    ",", *[F.col(f"mh{b * rows + r}") for r in range(rows)]
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return sig.select(*id_cols, F.explode(band_structs).alias("band")).select(
        *id_cols, "band.band_idx", "band.band_key"
    )


def simhash60(features_col: str) -> Column:
    """60-bit SimHash as a single fold expression (semantic spec; use
    :func:`simhash60_agg` in production plans — this form is interpreted
    per element and gets re-inlined by CollapseProject).

    Per-bit majority vote over distinct-feature hashes; the finish
    lambda packs the votes into a bigint. 60 bits (not 64) keeps the
    signature inside the positive bigint range on every engine."""
    h = "CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)"
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


def simhash60_agg(hashed: DataFrame, id_cols: list[str]) -> DataFrame:
    """60-bit SimHash over the exploded hash relation: 60 codegen'd
    conditional sums (one per bit) + a pack projection. Bit-identical to
    :func:`simhash60` on the same feature multiset, but whole-stage
    codegen'd with map-side partial aggregation.

    A packed variant (four 16-bit ones-counters per long, 15 sums
    instead of 60) measured ~10% faster on the signature stage in
    isolation but SLOWER end-to-end: CollapseProject re-inlines the
    pack projection into every downstream reference (7 LSH bands + the
    verify), and the packed extraction is ~3× the per-reference cost of
    the simple `vote > 0` form. Kept the simple form — see PERF.md #12."""
    votes = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(60)
    ]
    agg = hashed.groupBy(*id_cols).agg(*votes)
    packed = reduce(
        add,
        [
            F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
            for b in range(60)
        ],
    )
    return agg.select(*id_cols, packed.cast("bigint").alias("simhash"))


def jaccard(a: Column | str, b: Column | str) -> Column:
    """Jaccard similarity of two distinct-element arrays."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.size(F.array_intersect(ca, cb)).cast("double") / F.size(
        F.array_union(ca, cb)
    ).cast("double")
