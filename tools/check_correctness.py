"""Local mimic of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, sorted
column names, and an order-insensitive value hash. Strict: floats must
match exactly (the engine's decimal-exact aggregation policy makes that
achievable); on mismatch it prints a diff sample so the query or oracle
can be fixed before the driver sees it.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

from content_analytics_etl_spark.schemas import TABLE_NAMES  # noqa: E402
from content_analytics_etl_spark.session import get_spark  # noqa: E402


def canon(v) -> str:
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        # repr of the double — exact bit identity required
        return f"f:{v!r}"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, bytes):
        return "y:" + v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return f"{type(v).__name__[:1]}:{v}"


def table_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


# Queries that MUST return at least this many rows at any sf: a query
# whose oracle is also empty/trivial would "pass" while testing nothing
# (VERDICT r5/r6: graph_common_neighbors is legitimately empty at small
# sf, which is why the _pruned variant exists — so the harness must fail
# loudly if the pruned variant ever regresses to vacuous too).
MIN_ROWS = {
    "graph_common_neighbors_pruned": 1,
    "graph_clustering_coefficient": 1,
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )

    n_pass = n_fail = n_weak = 0
    for qname, fn in qs.items():
        if only and qname not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {qname}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        if qname not in oracles:
            print(f"WEAK {qname}: rows={len(srows)} (no oracle) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            res = con.execute(oracles[qname])
            ocols = [d[0] for d in res.description]
            orows = [tuple(r) for r in res.fetchall()]
        except Exception:
            print(f"FAIL {qname}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            continue

        problems = []
        if len(srows) < MIN_ROWS.get(qname, 0):
            problems.append(
                f"non-vacuity floor: {len(srows)} rows < {MIN_ROWS[qname]}"
            )
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            hs, ho = table_hash(srows, scols), table_hash(orows, ocols)
            if hs != ho:
                problems.append("value-hash mismatch")
                sset = {tuple(canon(v) for v in r) for r in srows}
                oset = {tuple(canon(v) for v in r) for r in orows}
                diff_s = list(sset - oset)[:3]
                diff_o = list(oset - sset)[:3]
                print(f"  spark-only sample: {diff_s}")
                print(f"  oracle-only sample: {diff_o}")
                print(f"  spark cols {scols}")
                print(f"  oracle cols {ocols}")
        if problems:
            print(f"FAIL {qname}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS {qname}: rows={len(srows)} [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
