"""Per-query scaling exponents from two bench captures.

Reads BENCH_FULL.json (sf0.1) and BENCH_SF1.json (sf1, same protocol)
and prints exponent = log10(t_sf1 / t_sf01) for every query present in
both, sorted steepest first. Exponent 1.0 = linear in the 10x row
growth; negative = fixed constants dominate. Queries missing from
either capture are listed so silent coverage gaps are visible.
"""

from __future__ import annotations

import json
import math
import os
import sys

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
a = json.load(open(os.path.join(here, sys.argv[1] if len(sys.argv) > 1 else "BENCH_FULL.json")))
b = json.load(open(os.path.join(here, sys.argv[2] if len(sys.argv) > 2 else "BENCH_SF1.json")))
qa, qb = a["queries"], b["queries"]
both = sorted(set(qa) & set(qb))
missing = sorted(set(qa) ^ set(qb))
rows = []
for q in both:
    t0, t1 = qa[q], qb[q]
    if t0 <= 0 or t1 <= 0:
        continue
    rows.append((math.log10(t1 / t0), t0, t1, q))
rows.sort(reverse=True)
print(f"{'exp':>6} {'sf0.1':>8} {'sf1':>8}  query")
for e, t0, t1, q in rows:
    print(f"{e:6.2f} {t0:8.3f} {t1:8.3f}  {q}")
print(f"\nsum sf0.1={sum(r[1] for r in rows):.1f}s sf1={sum(r[2] for r in rows):.1f}s "
      f"ratio={sum(r[2] for r in rows)/sum(r[1] for r in rows):.2f}x n={len(rows)}")
if missing:
    print("missing from one capture:", " ".join(missing))
