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

Exception closed in round 14 (ADVICE r13, low): the multimodal codecs
live ENTIRELY in module-level tables and helpers
(``content_analytics_etl_spark/multimodal.py``) behind thin plan
functions, AND their oracles use images too degenerate to observe every
table (the r13 zigzag fix changed no plan source and no sweep output) —
the "helper rewrites come with a call-site change" mitigation is
structurally false there.  ``EXTRA_SOURCES`` folds the whole helper
module's bytes into those queries' fingerprints, so any codec edit
re-enters them into the driver window.

Usage:
    python tools/qfp.py            # print name<TAB>fp for all queries
"""

from __future__ import annotations

import hashlib
import inspect
import os
import sys


# plan modules whose queries delegate their substance to a helper
# module: the helper's full source is folded into the fingerprint of
# every query the plan module registers (keys are fn.__module__ values,
# paths are repo-relative)
EXTRA_SOURCES: dict[str, list[str]] = {
    "content_analytics_etl_spark.plans.multimodal_queries": [
        "content_analytics_etl_spark/multimodal.py",
    ],
}

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
    for extra in EXTRA_SOURCES.get(getattr(fn, "__module__", ""), []):
        h.update(b"\x00")
        with open(os.path.join(_REPO, extra), "rb") as fh:
            h.update(fh.read())
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
