"""Warm min-of-3 wall-clock for a query subset at one sf_dir.

The SCALE.md capture harness: used for the per-round scaling-exponent
measurements on the scratch corpora, where running the full bench at
sf3 would cost more wall than the 16-slowest subset the exponent table
actually reads.  Producer-pipeline builds run in the untimed warm pass
and are reported separately (same accounting as bench.py).

Usage:
    python tools/time_queries.py SF_DIR OUT.json name1 name2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from content_analytics_etl_spark import cache  # noqa: E402
from content_analytics_etl_spark.plans import all_queries  # noqa: E402
from content_analytics_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for q in names:  # untimed warm: JIT + codegen + producer builds
        qs[q](spark, sf_dir).write.format("noop").mode("overwrite").save()
    t: dict[str, float] = {}
    for _ in range(3):
        for q in names:
            t0 = time.time()
            qs[q](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            t[q] = min(t.get(q, dt), dt)
    out = {
        "sf_dir": sf_dir,
        "queries": {k: round(v, 3) for k, v in t.items()},
        "producer_build_seconds": dict(sorted(cache.BUILD_SECONDS.items())),
        "aggregation": "per-query min over 3 timed passes after untimed warm",
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out["queries"][k] for k in sorted(out["queries"])}))


if __name__ == "__main__":
    main()
