"""OLAP derivation operators (SURVEY.md §2.5 F3-F7).

Row-wise derivations over the wide profile: argmax label (``most_watch``,
``ETL_full.py:93-108``), null-skipping concat of active categories
(``Taste``, ``ETL_full.py:110-120``), and threshold bucketization
(``Active_day``, ``ETL_full.py:122-138``). All pure Column expressions —
codegen'd, zero shuffles, zero UDFs.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["argmax_label", "taste_label", "bucketize"]


def argmax_label(columns: Mapping[str, str]) -> Column:
    """F3/F4: label of the row-wise max over ``columns`` ({col: label}).

    Tie-break = first WHEN in iteration order, exactly the reference's
    documented tie order (Child > Movie > Relax > Sport > TV for the
    viewing profile — ``ETL_full.py:101-107``). NULL only if every input
    is NULL (impossible after fill(0)).
    """
    cols = list(columns)
    max_col = F.greatest(*[F.col(c) for c in cols]) if len(cols) > 1 else F.col(cols[0])
    expr: Column | None = None
    for c, label in columns.items():
        cond = F.col(c) == max_col
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    assert expr is not None
    return expr


def taste_label(columns: Mapping[str, str], *, sep: str = "-") -> Column:
    """F5: hyphen-join the labels of every non-zero category.

    ``concat_ws`` skips NULLs natively, so a ``when(col != 0, label)``
    with no otherwise (→ NULL) per element reproduces the reference
    exactly, including the all-zero ⇒ empty-string edge
    (``ETL_full.py:110-120``).
    """
    parts = [F.when(F.col(c) != 0, F.lit(label)) for c, label in columns.items()]
    return F.concat_ws(sep, *parts)


def bucketize(
    value: Column | str,
    bounds: Sequence[float],
    labels: Sequence[str],
) -> Column:
    """F6/F7: threshold bucketization. ``bounds`` are the N-1 upper bounds
    splitting the domain into N ``labels`` buckets:
    value < bounds[0] → labels[0]; bounds[i-1] <= value < bounds[i] →
    labels[i]; value >= bounds[-1] → labels[-1]. Reproduces the
    reference's Low/Medium/High Active_day chain (``ETL_full.py:133-137``).
    """
    if len(labels) != len(bounds) + 1:
        raise ValueError("need len(labels) == len(bounds) + 1")
    col = F.col(value) if isinstance(value, str) else value
    expr = F.when(col < bounds[0], labels[0])
    for i in range(1, len(bounds)):
        expr = expr.when((col >= bounds[i - 1]) & (col < bounds[i]), labels[i])
    return expr.when(col >= bounds[-1], labels[-1])
