"""Re-time a subset of registered queries under bench.py's protocol
(one untimed warm pass, then per-query MIN of three timed passes
through the noop sink) and optionally patch an existing capture JSON.

Exists for the round-pattern where a late in-round fix changes a few
queries AFTER the full capture ran (round 10: SF3_FIX.json; round 11:
the nb = 6 near-dup operating point): re-timing only the changed
queries on an idle box and recording them over the stale entries keeps
the committed capture internally consistent, with the patch list noted
in the JSON itself.

Usage:
  python tools/retime_queries.py SF_DIR q1 [q2 ...] [--patch CAPTURE.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from content_analytics_etl_spark.plans import all_queries  # noqa: E402
from content_analytics_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    patch = None
    if "--patch" in args:
        i = args.index("--patch")
        patch = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir, names = args[0], args[1:]
    spark = get_spark("retime")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    out: dict[str, float] = {}
    for name in names:
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm
        best = None
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"{name}: {out[name]}s")
    if patch:
        with open(patch) as f:
            cap = json.load(f)
        # ADVICE r11 (low): record the re-timed values ALONGSIDE the
        # originals, never over them — a later-session re-time mixes
        # measurement conditions (JVM, cache, machine load) into the
        # capture, so the original same-session numbers must stay
        # readable and every patched entry carries both values.
        # ADVICE r12 (low): on a REPEATED patch of the same query,
        # cap["queries"][n] already holds the first re-time's value —
        # keep the first recorded original (the true same-session
        # number), never overwrite it with a prior re-time.
        prior = cap.get("retimed", {})
        cap.setdefault("retimed", {}).update(
            {
                n: {
                    "original_seconds": (
                        prior[n]["original_seconds"]
                        if n in prior
                        else cap["queries"].get(n)
                    ),
                    "retimed_seconds": v,
                    "note": "post-capture fix re-time in a SEPARATE "
                    "session, same warm+min3 protocol — conditions "
                    "differ from the capture's; exponent readers "
                    "should prefer a full re-capture when headline "
                    "queries change",
                }
                for n, v in out.items()
            }
        )
        cap["queries"].update(out)
        with open(patch, "w") as f:
            json.dump(cap, f, indent=1, sort_keys=True)
        print(f"patched {patch} (originals preserved under 'retimed')")


if __name__ == "__main__":
    main()
