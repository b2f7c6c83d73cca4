"""Content fingerprints for registered queries (ADVICE r10, medium).

Round 10 rewrote both engine sides of several queries whose lifetime
verdicts dated from round 9 — the rotation treated them as "verified"
even though the verified content no longer existed.  The fix: lifetime
verdicts are keyed by a CONTENT FINGERPRINT of the query —
sha256(plan function source + oracle SQL) — and
``tools/rotate_window.py`` treats any query whose current fingerprint
differs from its recorded one as UNVERIFIED, which puts it at the front
of the next driver window (unverified-first policy).

Boundary (documented, not hidden): the fingerprint covers the query
function's own source via ``inspect.getsource`` plus its oracle string.
A change to a shared helper (e.g. ``_scaled_band_rows``) that leaves
the query function's text untouched escapes the hash — the mitigation
is that substantive helper rewrites in this repo always come with a
call-site change (new arguments/constants), and the full-registry
sf0.01 DuckDB sweep (`tools/check_correctness.py`) re-verifies every
query each round regardless.

Usage:
    python tools/qfp.py            # print name<TAB>fp for all queries
"""

from __future__ import annotations

import hashlib
import inspect
import os
import sys


def fingerprint(fn, oracle_sql: str | None) -> str:
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):  # builtins / partials: module file hash
        mod = sys.modules.get(getattr(fn, "__module__", ""), None)
        path = getattr(mod, "__file__", None)
        src = open(path).read() if path else repr(fn)
    h = hashlib.sha256()
    h.update(src.encode())
    h.update(b"\x00")
    h.update((oracle_sql or "").encode())
    return h.hexdigest()[:16]


def all_fingerprints() -> dict[str, str]:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from content_analytics_etl_spark.plans import all_oracles, all_queries

    oracles = all_oracles()
    return {
        name: fingerprint(fn, oracles.get(name))
        for name, fn in all_queries().items()
    }


if __name__ == "__main__":
    for name, fp in sorted(all_fingerprints().items()):
        print(f"{name}\t{fp}")
