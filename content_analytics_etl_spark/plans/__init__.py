"""Query plans: every ``queries()`` entry the engine exposes, paired with
a DuckDB oracle SQL string where the semantics are SQL-expressible.

Each module exposes ``QUERIES: dict[str, callable(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]``; ``registry`` merges them.
"""

from .registry import all_queries, all_oracles

__all__ = ["all_queries", "all_oracles"]
