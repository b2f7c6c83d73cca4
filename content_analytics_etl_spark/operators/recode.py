"""Categorical recode (SURVEY.md §2.2 P5): value → category via an
ordered CASE WHEN / IN-list chain.

Reference semantics (``ETL_full.py:48-55``): first matching branch wins,
membership is case-sensitive, anything unmatched gets a sentinel
(``'Error'``). The mapping is data-independent, so it stays a pure
Column expression — whole-stage-codegen'd, no join, no UDF. (A
broadcast-joined dimension table is the alternative when the mapping is
data-driven; for a fixed in-query map the CASE chain is strictly
cheaper.)
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["recode_category", "VIEWING_CATEGORY_MAP", "VIEWING_CATEGORIES"]

# The reference's AppName → Type map (ETL_full.py:48-55). Order matters:
# first match wins. 'KPLUS' and 'KPlus' are both listed because the
# reference's isin is case-sensitive.
VIEWING_CATEGORY_MAP: dict[str, tuple[str, ...]] = {
    "TVDuration": ("CHANNEL", "DSHD", "KPLUS", "KPlus"),
    "MovieDuration": ("VOD", "FIMS_RES", "BHD_RES", "VOD_RES", "FIMS", "BHD", "DANET"),
    "RelaxDuration": ("RELAX",),
    "ChildDuration": ("CHILD",),
    "SportDuration": ("SPORT",),
}

VIEWING_CATEGORIES = tuple(VIEWING_CATEGORY_MAP)  # stable pivot value list


def recode_category(
    src: Column | str,
    mapping: Mapping[str, Sequence[str]],
    *,
    default: str = "Error",
) -> Column:
    """Build the ordered CASE WHEN chain: ``src IN mapping[label] → label``,
    else ``default``. First match wins (dict order = branch order)."""
    col = F.col(src) if isinstance(src, str) else src
    expr: Column | None = None
    for label, values in mapping.items():
        cond = col.isin(list(values))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    if expr is None:
        return F.lit(default)
    return expr.otherwise(default)
