"""Compute the canonical DRIVER_WINDOW for the next round.

Policy (VERDICT r6 #1 — staleness rotation):

1. every registered query with NO lifetime driver verdict comes first
   (new queries must be hashed before anything is re-hashed);
   since round 11 (ADVICE r10, medium) this includes every query whose
   CONTENT FINGERPRINT (tools/qfp.py: sha256 of plan source + oracle
   SQL) no longer matches the one recorded with its verdict — a
   rewritten query is unverified no matter how recent its green round;
   since round 12 (ADVICE r11, medium) a fingerprint-LESS record
   (pre-round-11 bare int) is also unverified: without a recorded
   fingerprint the drift rule cannot fire, so a pre-r11 query rewritten
   after its green round would otherwise silently stay "verified".
   Unverified ordering: never-verified first, then fingerprint-drifted,
   then fingerprint-less oldest-round-first (ties by name throughout).
2. the remaining slots are filled with the queries whose most recent
   green driver verdict is OLDEST, ties broken by name.

``tools/lifetime_driver_verified.json`` records
``{name: {"r": last_green_round, "fp": fingerprint}}`` (bare-int values
are pre-round-11 records without fingerprints; they re-enter the
window until re-hashed and stamped).  With 235 queries and a 50-slot
window, every query is re-hashed against the drifting tree every ~4-5
rounds.

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
    """{name: last_green_round} regardless of on-disk record shape."""
    with open(LIFETIME) as f:
        data = json.load(f)
    if isinstance(data, list):  # pre-round-7 flat list: round unknown
        return {n: 0 for n in data}
    return {
        n: (v["r"] if isinstance(v, dict) else v) for n, v in data.items()
    }


def lifetime_fps() -> dict[str, str]:
    """{name: recorded_fingerprint} for records that carry one."""
    with open(LIFETIME) as f:
        data = json.load(f)
    if isinstance(data, list):
        return {}
    return {
        n: v["fp"]
        for n, v in data.items()
        if isinstance(v, dict) and v.get("fp")
    }


def canonical_window(registered: list[str]) -> list[str]:
    """Unverified-first (never verified, content fingerprint drifted
    since the recorded verdict, or fingerprint-less pre-r11 record —
    ADVICE r11 medium), then oldest-verdict-first (ties by name)."""
    sys.path.insert(0, HERE)
    from qfp import all_fingerprints

    rounds = lifetime_rounds()
    recorded_fp = lifetime_fps()
    current_fp = all_fingerprints()

    def tier(n: str) -> tuple:
        """Lower sorts earlier.  0 = never verified, 1 = fingerprint
        drifted since verdict, 2 = fingerprint-less record (cannot
        prove the verified content is the current content), 3 =
        verified with matching fingerprint."""
        if n not in rounds:
            return (0, n)
        rec = recorded_fp.get(n)
        if rec is None:
            return (2, rounds[n], n)
        if rec != current_fp.get(n):
            return (1, n)
        return (3, rounds[n], n)

    unverified = sorted(
        (n for n in registered if tier(n)[0] < 3), key=tier
    )
    stale = sorted(
        ((rounds[n], n) for n in registered if tier(n)[0] == 3),
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
