"""Driver-contract typing guards.

The verification driver canonicalizes both sides through pandas before
hashing, which imposes two type constraints the repo's local checker
(fetchall-based, exact Python ints) cannot see:

1. DuckDB HUGEINT: a raw integer ``SUM`` in an oracle returns HUGEINT,
   which pandas converts to float64 ("7.0") while Spark emits BIGINT
   ("7") — the hashes differ even though the values are equal.  Every
   oracle output column must therefore avoid HUGEINT/UHUGEINT (wrap the
   sum in ``CAST(... AS BIGINT)``).
2. Nested cells: pandas ``sort_values`` cannot sort list/struct/map
   cells ("unhashable type: 'list'"), so no query may return an
   ArrayType/MapType/StructType output column, and no oracle a
   LIST/STRUCT/MAP/JSON column.

Round-2 hit both classes in the driver (events_session,
events_json_props, multimodal_metadata hash-false; multimodal_features
harness error); this test encodes the exact scan that found them so new
queries cannot reintroduce either.

DESCRIBE only plans the query (no execution), so sweeping all ~120
oracles is fast.  The Spark side checks declared output schemas by
building each DataFrame lazily — no action is triggered for ordinary
queries; the few layout queries that materialize side-effect warehouses
at build time run at sf0.001.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

from content_analytics_etl_spark.plans.registry import (
    DRIVER_WINDOW,
    all_oracles,
    all_queries,
)
from content_analytics_etl_spark.schemas import TABLE_NAMES

# DuckDB types pandas either widens to float64 (HUGEINT), converts with
# engine-specific rounding (DECIMAL), or turns into unhashable Python
# objects (nested / JSON). Spark DecimalType is symmetric: pandas gets
# decimal.Decimal objects whose repr/hash never matches the oracle's
# float64, so both sides must cast to DOUBLE/BIGINT before returning.
_FORBIDDEN_DUCK = (
    "HUGEINT", "UHUGEINT", "DECIMAL", "STRUCT", "MAP", "JSON", "[]",
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    yield con
    con.close()


def test_no_hugeint_or_nested_in_oracle_outputs(duck):
    bad: dict[str, list[tuple[str, str]]] = {}
    for qname, sql in all_oracles().items():
        rows = duck.execute(f"DESCRIBE {sql}").fetchall()
        hits = [
            (col, typ)
            for col, typ, *_ in rows
            if any(tok in typ.upper() for tok in _FORBIDDEN_DUCK)
        ]
        if hits:
            bad[qname] = hits
    assert not bad, (
        "oracle output columns with driver-hostile DuckDB types "
        f"(CAST sums to BIGINT, flatten nested cols): {bad}"
    )


def test_no_nested_types_in_query_schemas(spark, sf_dir):
    bad: dict[str, list[tuple[str, str]]] = {}
    for qname, fn in all_queries().items():
        df = fn(spark, sf_dir)  # lazy — declared schema only
        hits = [
            (f.name, f.dataType.simpleString())
            for f in df.schema.fields
            if isinstance(
                f.dataType,
                (T.ArrayType, T.MapType, T.StructType, T.DecimalType),
            )
        ]
        if hits:
            bad[qname] = hits
    assert not bad, (
        "query output schemas with nested types the driver cannot hash "
        f"(emit scalar columns instead): {bad}"
    )


def test_driver_window_is_fully_verifiable(duck):
    """Every driver-window slot must have an oracle (except declared
    rows-only entries) — a window slot without one wastes a hard
    verdict."""
    oracles = all_oracles()
    rows_only_allowed = set()  # keep empty: every window slot oracle-checked
    missing = [
        n for n in DRIVER_WINDOW if n not in oracles and n not in rows_only_allowed
    ]
    assert not missing, f"driver-window queries without an oracle: {missing}"
