"""DRIVER_WINDOW rotation guard (VERDICT r5 #7, staleness policy r6 #1).

The external driver hashes only the first 50 ``queries()`` names per
round; ``tools/lifetime_driver_verified.json`` records, for every query,
the most recent round in which it received a green driver verdict
(``{name: last_green_round}`` since round 7).  Rounds 4 and 5 shipped
the same window, wasting a full driver budget re-hashing double-green
names while 20 queries sat unverified — and once lifetime coverage hit
173/173 in round 6, the "every unverified name must be in the window"
rule constrained nothing.  These tests enforce the full canonical
policy from ``tools/rotate_window.py``:

1. never-driver-verified queries first (new queries always enter the
   next window),
2. remaining slots filled oldest-verdict-first (ties by name),

so every query is re-hashed against the drifting tree every ~3-4
rounds and a skipped rotation is a red test instead of a judge finding.

Round bookkeeping: when CORRECTNESS_r0N.json arrives green, run
``python tools/update_lifetime.py CORRECTNESS_r0N.json`` then rewrite
DRIVER_WINDOW from ``python tools/rotate_window.py``.
"""

from __future__ import annotations

import os
import sys

from content_analytics_etl_spark.plans import all_queries
from content_analytics_etl_spark.plans.registry import DRIVER_WINDOW

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_HERE, "tools"))

from rotate_window import canonical_window, lifetime_rounds  # noqa: E402


def test_window_is_driver_sized():
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50


def test_lifetime_names_are_registered():
    """A renamed/removed query must be pruned from the lifetime record
    (otherwise coverage arithmetic silently overcounts)."""
    stale = set(lifetime_rounds()) - set(all_queries().keys())
    assert not stale, f"lifetime record has unregistered names: {sorted(stale)}"


def test_window_is_canonical():
    """THE rotation guard: the window must equal tools/rotate_window.py's
    computation — unverified names first, then oldest-verdict fill.
    Set equality (not order): the driver hashes all 50 regardless of
    position within the prefix."""
    want = canonical_window(list(all_queries().keys()))
    extra = sorted(set(DRIVER_WINDOW) - set(want))
    missing = sorted(set(want) - set(DRIVER_WINDOW))
    assert not extra and not missing, (
        f"DRIVER_WINDOW is stale — regenerate from tools/rotate_window.py."
        f"\n  drop: {extra}\n  add:  {missing}"
    )


def test_window_queries_front_of_registry():
    """The driver hashes the FIRST 50 registration-order names; the
    window is only effective if all_queries() actually yields it first."""
    assert list(all_queries().keys())[:50] == DRIVER_WINDOW
