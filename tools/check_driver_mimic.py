"""Pandas-canonicalization mimic of the driver's correctness gate.

The local strict checker (check_correctness.py) compares Python values
with int/float normalization; the DRIVER instead pulls both sides into
pandas, sorts columns by name, sorts rows, and hashes — so dtype-level
divergences (DuckDB HUGEINT→float64, Spark Decimal→object, None vs NaN,
bool vs object) can hash-fail rows the strict checker passes. Round 2
lost 4 window slots to exactly that class. This tool reproduces the
pandas path end to end:

  Spark  : df.toPandas()
  DuckDB : con.execute(sql).df()
  both   : columns sorted by name → stringified cell-wise with a fixed
           float repr → row-sorted → md5

and reports dtype mismatches explicitly even when values agree.

Usage: python tools/check_driver_mimic.py [sf_dir] [query ...]
        (default: the DRIVER_WINDOW queries at sf0.01)
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from content_analytics_etl_spark.plans.registry import (  # noqa: E402
    DRIVER_WINDOW,
    all_oracles,
    all_queries,
)
from content_analytics_etl_spark.schemas import TABLE_NAMES  # noqa: E402
from content_analytics_etl_spark.session import get_spark  # noqa: E402


def _cell(v) -> str:
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "NULL"
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    s = str(v)
    # DATE columns arrive as datetime.date from Spark ("2024-01-10") but
    # as midnight datetime64 from DuckDB ("2024-01-10 00:00:00"); the
    # real driver verified this pairing green in round 2, so align the
    # two representations instead of flagging them.
    return s[:-9] if s.endswith(" 00:00:00") else s


def canon_frame(df: pd.DataFrame) -> tuple[str, list[str]]:
    df = df.reindex(sorted(df.columns), axis=1)
    cells = df.map(_cell)
    rows = sorted("\x1f".join(r) for r in cells.itertuples(index=False, name=None))
    h = hashlib.md5("\x1e".join(rows).encode()).hexdigest()
    return h, [f"{c}:{df[c].dtype}" for c in df.columns]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DRIVER_WINDOW
    spark = get_spark("driver_mimic")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries, oracles = all_queries(), all_oracles()
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            spdf = queries[name](spark, sf_dir).toPandas()
            dkdf = con.execute(oracles[name]).df()
            sh, sdt = canon_frame(spdf)
            dh, ddt = canon_frame(dkdf)
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(f"ERR  {name}: {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if sh != dh:
            print(f"FAIL {name}: hash mismatch  spark={sdt}  duck={ddt}")
            n_fail += 1
        else:
            note = ""
            if sdt != ddt:
                note = f"  (dtype drift, values equal: {sdt} vs {ddt})"
            print(f"PASS {name}: rows={len(spdf)} [{dt:.1f}s]{note}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail (pandas driver mimic)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
