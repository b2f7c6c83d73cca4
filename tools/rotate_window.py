"""Compute the canonical DRIVER_WINDOW for the next round.

Policy (VERDICT r6 #1 — staleness rotation):

1. every registered query with NO lifetime driver verdict comes first
   (new queries must be hashed before anything is re-hashed);
2. the remaining slots are filled with the queries whose most recent
   green driver verdict is OLDEST, ties broken by name.

``tools/lifetime_driver_verified.json`` records ``{name: last_green_round}``
(migrated in round 7 from the flat round-6 list).  With 173+ queries and a
50-slot window, every query is re-hashed against the drifting tree every
~3-4 rounds.

Usage:
    python tools/rotate_window.py          # print the canonical 50 names
    python tools/rotate_window.py --check  # exit 1 if registry.py differs

``tests/test_driver_window.py`` runs the same computation, so committing a
stale window is a red test.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
LIFETIME = os.path.join(HERE, "lifetime_driver_verified.json")
WINDOW_SIZE = 50


def lifetime_rounds() -> dict[str, int]:
    with open(LIFETIME) as f:
        data = json.load(f)
    if isinstance(data, list):  # pre-round-7 flat list: round unknown
        return {n: 0 for n in data}
    return data


def canonical_window(registered: list[str]) -> list[str]:
    """Unverified-first, then oldest-verdict-first (ties by name)."""
    rounds = lifetime_rounds()
    unverified = sorted(n for n in registered if n not in rounds)
    stale = sorted(
        ((rounds[n], n) for n in registered if n in rounds),
    )
    out = unverified[:WINDOW_SIZE]
    out += [n for _, n in stale[: WINDOW_SIZE - len(out)]]
    return out


def main() -> None:
    sys.path.insert(0, os.path.dirname(HERE))
    from content_analytics_etl_spark.plans import all_queries
    from content_analytics_etl_spark.plans.registry import DRIVER_WINDOW

    want = canonical_window(list(all_queries().keys()))
    if "--check" in sys.argv:
        if set(DRIVER_WINDOW) != set(want):
            extra = sorted(set(DRIVER_WINDOW) - set(want))
            missing = sorted(set(want) - set(DRIVER_WINDOW))
            sys.exit(f"stale window.\n  drop: {extra}\n  add:  {missing}")
        print("window is canonical")
        return
    for n in want:
        print(n)


if __name__ == "__main__":
    main()
