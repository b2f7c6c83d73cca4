"""DRIVER_WINDOW rotation guard (VERDICT r5 #7).

The external driver hashes only the first 50 ``queries()`` names per
round; ``tools/lifetime_driver_verified.json`` records every query that
has EVER received a green driver verdict (updated each round when
CORRECTNESS_r0N lands). Rounds 4 and 5 both shipped the same window,
wasting a full driver budget re-hashing double-green names while 20
queries sat unverified — these tests make that failure mode a red test
instead of a judge finding.

Round bookkeeping: when CORRECTNESS_r0N.json arrives green, append the
window's names to the JSON (``python tools/update_lifetime.py``-style
one-liner in PERF.md); when a NEW query is registered it must not be
added to the JSON until a driver verdict exists, which forces it into
the next window here.
"""

from __future__ import annotations

import json
import os

from content_analytics_etl_spark.plans import all_queries
from content_analytics_etl_spark.plans.registry import DRIVER_WINDOW

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LIFETIME = os.path.join(_HERE, "tools", "lifetime_driver_verified.json")


def _lifetime() -> set[str]:
    with open(_LIFETIME) as f:
        return set(json.load(f))


def test_window_is_driver_sized():
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50


def test_lifetime_names_are_registered():
    """A renamed/removed query must be pruned from the lifetime record
    (otherwise coverage arithmetic silently overcounts)."""
    stale = _lifetime() - set(all_queries().keys())
    assert not stale, f"lifetime record has unregistered names: {sorted(stale)}"


def test_every_unverified_query_is_in_the_window():
    """THE rotation guard: while never-driver-verified queries exist,
    the window must contain all of them (or be entirely composed of
    them when there are more than 50). A window pinning already-verified
    names while gaps remain is exactly the r04/r05 waste."""
    unverified = sorted(set(all_queries().keys()) - _lifetime())
    window = set(DRIVER_WINDOW)
    if len(unverified) <= 50:
        missing = [n for n in unverified if n not in window]
        assert not missing, (
            f"never-driver-verified queries left out of DRIVER_WINDOW: "
            f"{missing} — rotate the window (registry.py) or record their "
            f"verdict in tools/lifetime_driver_verified.json"
        )
    else:
        verified_in_window = sorted(window & _lifetime())
        assert not verified_in_window, (
            f"{len(unverified)} unverified queries exist but the window "
            f"spends slots on verified ones: {verified_in_window}"
        )


def test_window_queries_front_of_registry():
    """The driver hashes the FIRST 50 registration-order names; the
    window is only effective if all_queries() actually yields it first."""
    assert list(all_queries().keys())[:50] == DRIVER_WINDOW
