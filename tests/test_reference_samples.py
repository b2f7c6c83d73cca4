"""Golden parity on the reference's OWN sample inputs
(/root/reference/Dataset/sample_*.jsonl, read-only): the pipeline's
output must match an independent pure-Python re-implementation of the
reference semantics (SURVEY.md §2) computed directly from the JSON —
an oracle with no Spark in the loop."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from content_analytics_etl_spark.pipeline import run_viewing_pipeline
from content_analytics_etl_spark.sources.readers import read_viewing_log

SAMPLES = sorted(str(p) for p in Path("/root/reference/Dataset").glob("sample_*.jsonl"))

CATEGORY = {}
for app in ("CHANNEL", "DSHD", "KPLUS", "KPlus"):
    CATEGORY[app] = "TVDuration"
for app in ("VOD", "FIMS_RES", "BHD_RES", "VOD_RES", "FIMS", "BHD", "DANET"):
    CATEGORY[app] = "MovieDuration"
CATEGORY.update(RELAX="RelaxDuration", CHILD="ChildDuration", SPORT="SportDuration")

DUR_COLS = ["ChildDuration", "MovieDuration", "RelaxDuration", "SportDuration", "TVDuration"]
MOST = {"ChildDuration": "Child", "MovieDuration": "Movie", "RelaxDuration": "Relax",
        "SportDuration": "Sport", "TVDuration": "TV"}


def _python_oracle(paths):
    """Reference semantics in plain Python: row-count devices (A3 quirk),
    sentinel/3VL filter, recode, pivot-sum, argmax with F4 tie order,
    null-skipping taste, day bucketing."""
    devices: dict[str, int] = {}
    sums: dict[str, dict[str, int]] = {}
    for path in paths:
        for line in Path(path).read_text().splitlines():
            try:
                rec = json.loads(line)["_source"]
            except (json.JSONDecodeError, KeyError, TypeError):
                continue  # malformed → all-NULL row → dropped by P3's 3VL
            if rec is None:
                continue
            contract = rec.get("Contract")
            if contract is None:
                continue
            devices[contract] = devices.get(contract, 0) + 1  # pre-filter branch A
            if contract == "0":
                continue
            cat = CATEGORY.get(rec.get("AppName"))
            if cat is None:
                continue  # 'Error' rows dropped by P4
            sums.setdefault(contract, dict.fromkeys(DUR_COLS, 0))
            sums[contract][cat] += rec["TotalDuration"]
    out = {}
    for contract, d in sums.items():
        mx = max(d.values())
        most = next(MOST[c] for c in DUR_COLS if d[c] == mx)  # F4 tie order
        taste = "-".join(MOST[c] for c in DUR_COLS if d[c] != 0)
        days = sum(d.values()) / 86400
        bucket = "Low" if days < 10 else ("Medium" if days < 20 else "High")
        out[contract] = {**d, "TotalDevices": devices[contract],
                         "most_watch": most, "Taste": taste, "Active_day": bucket}
    return out


@pytest.mark.skipif(not SAMPLES, reason="reference samples not present")
def test_reference_sample_parity(spark):
    flat = read_viewing_log(spark, SAMPLES)
    got = {r["Contract"]: r.asDict() for r in run_viewing_pipeline(flat).collect()}
    want = _python_oracle(SAMPLES)
    assert set(got) == set(want)
    for contract, w in want.items():
        g = got[contract]
        for k, v in w.items():
            assert g[k] == v, f"{contract}.{k}: spark={g[k]} oracle={v}"
