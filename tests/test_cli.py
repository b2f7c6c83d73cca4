"""CLI surface (python -m content_analytics_etl_spark ...): the
reference-script replacement must run end-to-end in-process."""

from __future__ import annotations

import glob

from content_analytics_etl_spark.__main__ import main


def test_cli_etl_on_reference_samples(spark, tmp_path, capsys):
    out = str(tmp_path / "profiles")
    rc = main(
        [
            "etl",
            "--input", "/root/reference/Dataset",
            "--output", out,
            "--start", "20220401",
            "--end", "20220402",
        ]
    )
    assert rc == 0
    files = glob.glob(f"{out}/part-*.csv")
    assert len(files) == 1  # coalesce(1): single CSV, no shuffle
    header = open(files[0]).readline().strip().split(",")
    assert "Contract" in header and "most_watch" in header and "Taste" in header


def test_cli_query_runs(spark, capsys):
    assert main(["query", "events_value_histogram", "-n", "3"]) == 0
    assert "bin" in capsys.readouterr().out


def test_cli_query_unknown_name(spark, capsys):
    assert main(["query", "nope"]) == 2
    assert "available" in capsys.readouterr().out
