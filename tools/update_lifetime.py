"""Record a green driver round into tools/lifetime_driver_verified.json.

Usage:
    python tools/update_lifetime.py CORRECTNESS_r06.json

Reads the round's correctness record, adds every query whose driver
verdict is green to the lifetime list, and rewrites the JSON sorted.
Run at the START of the round after a green CORRECTNESS_r0N lands, then
rotate DRIVER_WINDOW (tests/test_driver_window.py fails until every
still-unverified query is in the window).
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
LIFETIME = os.path.join(HERE, "lifetime_driver_verified.json")


def green_names(record: dict) -> list[str]:
    """Names with a passing verdict, across the record shapes the
    driver has emitted (per-query dicts keyed under 'queries' or at
    the top level, with a boolean 'match'/'ok'/'pass' or a 'status')."""
    qmap = record.get("queries", record)
    out = []
    for name, v in qmap.items():
        if not isinstance(v, dict):
            continue
        # the driver's shape (CORRECTNESS_r05): rows/schema/hash_match
        # booleans + err; hash_match True (or rows_match for declared
        # rows-only checks) with no error is a green verdict
        if v.get("err"):
            continue
        if v.get("hash_match") is True or (
            "hash_match" not in v and v.get("rows_match") is True
        ):
            out.append(name)
        elif any(v.get(k) is True for k in ("match", "ok", "pass")):
            out.append(name)
    return out


def main() -> None:
    if len(sys.argv) != 2:
        sys.exit(__doc__)
    with open(sys.argv[1]) as f:
        record = json.load(f)
    fresh = green_names(record)
    if not fresh:
        sys.exit(f"no green verdicts found in {sys.argv[1]} — check its shape")
    with open(LIFETIME) as f:
        lifetime = set(json.load(f))
    added = sorted(set(fresh) - lifetime)
    lifetime |= set(fresh)
    with open(LIFETIME, "w") as f:
        json.dump(sorted(lifetime), f, indent=0)
        f.write("\n")
    print(f"added {len(added)}: {added}")
    print(f"lifetime total: {len(lifetime)}")


if __name__ == "__main__":
    main()
