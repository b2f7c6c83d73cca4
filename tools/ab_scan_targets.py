"""A/B harness for SCAN_ROWS_PER_TASK tuning (VERDICT r7 #1).

Times a set of queries at $SPARK_GRAFT_SF_DIR under several
SCAN_ROWS_PER_TASK override configs IN ONE SESSION (warm pass + 3-pass
MIN per config, mirroring bench.py's policy).  Same-content layout
copies at different widths coexist since the round-8 prune fix, so
switching configs never thrashes the cache.  The first config is
re-run at the end to expose JVM warm-order bias.

Usage:
    python tools/ab_scan_targets.py q1,q2,... '[{}, {"embeddings": 64}]'
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from content_analytics_etl_spark.plans import all_queries  # noqa: E402
from content_analytics_etl_spark.session import get_spark  # noqa: E402
from content_analytics_etl_spark.sources import readers  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    configs = json.loads(sys.argv[2])
    configs = configs + [configs[0]]  # re-run first config last
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-scan-targets")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    base = dict(readers.SCAN_ROWS_PER_TASK)
    out = []
    for i, cfg in enumerate(configs):
        readers.SCAN_ROWS_PER_TASK.clear()
        readers.SCAN_ROWS_PER_TASK.update(base)
        readers.SCAN_ROWS_PER_TASK.update(cfg)
        for q in names:  # warm: compile + layout write
            qs[q](spark, sf_dir).write.format("noop").mode("overwrite").save()
        t: dict[str, float] = {}
        for _ in range(3):
            for q in names:
                t0 = time.time()
                qs[q](spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                t[q] = min(t.get(q, dt), dt)
        label = json.dumps(cfg, sort_keys=True) + (" (rerun)" if i == len(configs) - 1 else "")
        out.append((label, {k: round(v, 3) for k, v in t.items()}))
        print(json.dumps({"config": label, "timings": out[-1][1]}), flush=True)


if __name__ == "__main__":
    main()
