"""Record a green driver round into tools/lifetime_driver_verified.json.

Usage:
    python tools/update_lifetime.py CORRECTNESS_r07.json

Reads the round's correctness record, and for every query with a green
driver verdict sets ``lifetime[name] = {"r": round, "fp": fingerprint}``
(the round number is parsed from the filename; the fingerprint is
``tools/qfp.py``'s sha256 of the query's plan source + oracle SQL,
computed from the CURRENT tree).  Since round 11 (ADVICE r10, medium)
the verdict is content-keyed: ``tools/rotate_window.py`` treats a query
whose current fingerprint differs from its recorded one as UNVERIFIED,
so a rewritten query re-enters the window even if its name carries a
recent green round.  Pre-round-11 records are bare ints (no
fingerprint); they are treated as verified-at-that-round until the
rotation re-hashes them, at which point they acquire fingerprints.

MUST run at the START of the round, BEFORE any plan/oracle edits: the
fingerprints stamped here assert "this content is what the driver
verified", which is only true while the tree still matches the one the
driver ran on.  Then rotate DRIVER_WINDOW (``python
tools/rotate_window.py`` prints the canonical 50;
tests/test_driver_window.py fails until registry.py matches).
"""

from __future__ import annotations

import json
import os
import re
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
    m = re.search(r"r(\d+)", os.path.basename(sys.argv[1]))
    if not m:
        sys.exit("cannot parse round number from filename")
    rnd = int(m.group(1))
    with open(sys.argv[1]) as f:
        record = json.load(f)
    fresh = green_names(record)
    if not fresh:
        sys.exit(f"no green verdicts found in {sys.argv[1]} — check its shape")
    sys.path.insert(0, HERE)
    from qfp import all_fingerprints

    fps = all_fingerprints()
    with open(LIFETIME) as f:
        lifetime = json.load(f)
    if isinstance(lifetime, list):  # migrate pre-round-7 flat list
        lifetime = {n: 0 for n in lifetime}
    added = sorted(n for n in fresh if n not in lifetime)

    def _round_of(v) -> int:
        return v["r"] if isinstance(v, dict) else v

    for n in fresh:
        prev = _round_of(lifetime[n]) if n in lifetime else 0
        lifetime[n] = {"r": max(rnd, prev), "fp": fps[n]}
    with open(LIFETIME, "w") as f:
        json.dump(dict(sorted(lifetime.items())), f, indent=0)
        f.write("\n")
    print(f"round {rnd}: {len(fresh)} green, {len(added)} new: {added}")
    print(f"lifetime total: {len(lifetime)}")


if __name__ == "__main__":
    main()
