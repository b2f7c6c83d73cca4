"""Text-analysis Column builders (SURVEY.md §7 Phase 3 / BASELINE
"text analysis" extension): tokenization, normalization, marker counts.

All pure built-in expressions (split/filter/size/regexp) — JVM-side,
codegen'd, no UDFs — so they run at scan throughput and are
oracle-expressible in ANSI SQL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["norm_text", "tokens", "token_count", "marker_hits"]


def norm_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, whitespace
    runs collapsed to single spaces, trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of normalized text → array<string>."""
    return F.split(norm_text(col), " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def marker_hits(toks: Column, markers: Sequence[str]) -> Column:
    """Number of tokens that belong to a marker set (the n-gram-free
    heuristic behind language ID / stopword ratios)."""
    return F.size(F.filter(toks, lambda x: x.isin(list(markers))))
