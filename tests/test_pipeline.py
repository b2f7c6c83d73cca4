"""Golden end-to-end tests of the viewing-log pipeline against the
FIXTURES.md §1 edge-case corpus (written as JSONL exactly like the
reference's Elasticsearch-export input)."""

from __future__ import annotations

import json

import pytest

from content_analytics_etl_spark.pipeline import run_viewing_pipeline
from content_analytics_etl_spark.sources.readers import read_viewing_log


def _src(contract, mac, dur, app):
    rec = {"Mac": mac, "TotalDuration": dur, "AppName": app}
    if contract is not None:
        rec["Contract"] = contract
    return json.dumps(
        {"_index": "history", "_type": app.lower(), "_id": "x", "_score": 0, "_source": rec}
    )


@pytest.fixture(scope="module")
def log_path(tmp_path_factory):
    lines = [
        # sentinel + NULL contract → dropped by P3
        _src("0", "AA", 10, "VOD"),
        _src(None, "AA", 10, "VOD"),
        # unknown app → Error → dropped by P4 (but still counted in devices!)
        _src("HNH1", "AA", 10, "UNKNOWN_APP"),
        # case-variant apps
        _src("HNH1", "AA", 100, "KPLUS"),
        _src("HNH1", "BB", 50, "KPlus"),
        _src("HNH1", "BB", 7, "kplus"),  # wrong case → Error
        # multi-category contract with argmax tie (Child vs Movie at 200)
        _src("HNH2", "AA", 200, "CHILD"),
        _src("HNH2", "AA", 200, "VOD"),
        _src("HNH2", "BB", 30, "SPORT"),
        # single-category contract (pivot fill + single-label Taste)
        _src("HNH3", "CC", 864000, "RELAX"),  # exactly 10 days → Medium
        # high-activity contract
        _src("HNH4", "DD", 86400 * 25, "SPORT"),
        "this is not json",  # malformed line → PERMISSIVE all-NULL row
    ]
    p = tmp_path_factory.mktemp("logs") / "20220401.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_pipeline_fidelity(spark, log_path):
    flat = read_viewing_log(spark, log_path)
    out = {r["Contract"]: r.asDict() for r in run_viewing_pipeline(flat).collect()}

    # P3: sentinel and NULL contracts never appear
    assert "0" not in out and None not in out

    # HNH1: devices counts ALL log rows incl. Error rows (A3 quirk) = 4
    h1 = out["HNH1"]
    assert h1["TotalDevices"] == 4
    assert h1["TVDuration"] == 150  # KPLUS + KPlus; kplus dropped as Error
    assert h1["most_watch"] == "TV"
    assert h1["Taste"] == "TV"

    # HNH2: argmax tie Child=Movie=200 → Child (F4 tie order)
    h2 = out["HNH2"]
    assert h2["most_watch"] == "Child"
    assert h2["Taste"] == "Child-Movie-Sport"
    assert h2["TotalDevices"] == 3

    # HNH3: single category; others filled 0; 864000s = 10 days → Medium
    h3 = out["HNH3"]
    assert h3["MovieDuration"] == 0 and h3["ChildDuration"] == 0
    assert h3["Active_day"] == "Medium"
    assert h3["Taste"] == "Relax"

    # HNH4: 25 days → High
    assert out["HNH4"]["Active_day"] == "High"

    # malformed line became an all-NULL row → dropped with NULL contracts
    assert len(out) == 4


def test_pipeline_corrected_mode(spark, log_path):
    flat = read_viewing_log(spark, log_path)
    out = {
        r["Contract"]: r.asDict()
        for r in run_viewing_pipeline(flat, fidelity=False).collect()
    }
    assert out["HNH1"]["TotalDevices"] == 2  # distinct Macs AA, BB
    assert out["HNH2"]["TotalDevices"] == 2


def test_date_from_filename(spark, log_path):
    flat = read_viewing_log(spark, log_path, date_from_filename=True)
    dates = {str(r["log_date"]) for r in flat.select("log_date").distinct().collect()}
    assert dates == {"2022-04-01"}


def test_quarantine_channel_splits_good_and_corrupt(spark, tmp_path):
    from content_analytics_etl_spark.sources.readers import (
        read_viewing_log_quarantine,
    )

    lines = [
        '{"_index":"history","_type":"kplus","_id":"a","_score":0,'
        '"_source":{"Contract":"C1","Mac":"M1","TotalDuration":10,"AppName":"KPLUS"}}',
        "this is not json",
        '{"_index":"history","_type":"vod","_id":"b","_score":0,'
        '"_source":{"Contract":"C2","Mac":"M2","TotalDuration":20,"AppName":"VOD"}}',
        '{"broken": ',
    ]
    f = tmp_path / "20220401.jsonl"
    f.write_text("\n".join(lines) + "\n")
    good, quarantine, cached = read_viewing_log_quarantine(spark, str(f))
    g = {(r["Contract"], r["TotalDuration"]) for r in good.collect()}
    assert g == {("C1", 10), ("C2", 20)}
    q = quarantine.collect()
    assert {r["raw_line"] for r in q} == {"this is not json", '{"broken": '}
    assert all(r["source_file"].endswith("20220401.jsonl") for r in q)
    # the cached parent is exposed so callers can release the pin
    assert cached.is_cached
    cached.unpersist()
    assert not cached.is_cached
