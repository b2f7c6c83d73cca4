"""Randomized fidelity check of the full viewing pipeline against an
independent pure-Python simulation of the reference's semantics
(``ETL_full.py:38-150``). The two checked-in sample days exercise one
data shape; this drives the pipeline over seeded-random corpora hitting
every edge at once — ``Contract='0'`` sentinels, NULL contracts (3VL
drop), unknown AppNames (→ Error), case-sensitive ``KPlus``/``KPLUS``,
all-zero Taste, most_watch ties, duplicate (Contract, Mac) rows
(TotalDevices row-count quirk), and bucket boundaries at exactly 10/20
days — and asserts row-for-row equality.
"""

from __future__ import annotations

import random

import pytest

from content_analytics_etl_spark.pipeline import run_viewing_pipeline

APPS_TV = ["CHANNEL", "DSHD", "KPLUS", "KPlus"]
APPS_MOVIE = ["VOD", "FIMS_RES", "BHD_RES", "VOD_RES", "FIMS", "BHD", "DANET"]
APPS_OTHER = ["RELAX", "CHILD", "SPORT"]
APPS_BAD = ["kplus", "Sport", "NEWAPP", ""]
ALL_APPS = APPS_TV + APPS_MOVIE + APPS_OTHER + APPS_BAD

CAT_OF = (
    {a: "TVDuration" for a in APPS_TV}
    | {a: "MovieDuration" for a in APPS_MOVIE}
    | {"RELAX": "RelaxDuration", "CHILD": "ChildDuration", "SPORT": "SportDuration"}
)
CATS = ["TVDuration", "MovieDuration", "RelaxDuration", "ChildDuration", "SportDuration"]
# reference tie order (ETL_full.py:101-107) — dict order in pipeline._MOST_WATCH
TIE_ORDER = [
    ("ChildDuration", "Child"),
    ("MovieDuration", "Movie"),
    ("RelaxDuration", "Relax"),
    ("SportDuration", "Sport"),
    ("TVDuration", "TV"),
]


def _random_rows(seed: int, n: int) -> list[tuple]:
    rng = random.Random(seed)
    contracts = ["0", None] + [f"C{i}" for i in range(8)]
    rows = []
    for _ in range(n):
        c = rng.choice(contracts)
        mac = f"M{rng.randrange(4)}"
        app = rng.choice(ALL_APPS)
        # include exact 10/20-day boundary-hitting magnitudes
        dur = rng.choice([0, 1, 254, 86400 * 5, 86400 * 10, 86400 * 20])
        rows.append((c, mac, dur, app))
    return rows


def _reference_sim(rows: list[tuple]) -> dict[str, tuple]:
    """Pure-Python simulation of ETL_full.py's observable semantics."""
    devices: dict[str, int] = {}
    sums: dict[str, dict[str, int]] = {}
    for c, _mac, dur, app in rows:
        if c is not None:
            devices[c] = devices.get(c, 0) + 1  # row count, not distinct
        cat = CAT_OF.get(app)  # case-sensitive; None == 'Error'
        if c is None or c == "0" or cat is None:
            continue
        sums.setdefault(c, {k: 0 for k in CATS})[cat] += dur
    out: dict[str, tuple] = {}
    for c, per in sums.items():
        mx = max(per[k] for k in CATS)
        most = next(lbl for col, lbl in TIE_ORDER if per[col] == mx)
        taste = "-".join(lbl for col, lbl in TIE_ORDER if per[col] != 0)
        days = sum(per[k] for k in CATS) / 86400
        bucket = "Low" if days < 10 else ("Medium" if days < 20 else "High")
        out[c] = (
            per["ChildDuration"], per["MovieDuration"], per["RelaxDuration"],
            per["SportDuration"], per["TVDuration"],
            devices[c], most, taste, bucket,
        )
    return out


@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_pipeline_matches_reference_simulation(spark, seed):
    rows = _random_rows(seed, 400)
    flat = spark.createDataFrame(
        rows, "Contract string, Mac string, TotalDuration long, AppName string"
    )
    got = {
        r["Contract"]: (
            r["ChildDuration"], r["MovieDuration"], r["RelaxDuration"],
            r["SportDuration"], r["TVDuration"],
            r["TotalDevices"], r["most_watch"], r["Taste"], r["Active_day"],
        )
        for r in run_viewing_pipeline(flat, fidelity=True).collect()
    }
    assert got == _reference_sim(rows)
