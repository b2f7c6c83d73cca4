"""Scan-parallel layout cache (PERF finding 35): single-file sources
whose row-group layout cannot feed the session's cores are served from
a cores-way multi-file copy, row-identically."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from content_analytics_etl_spark.session import get_spark
from content_analytics_etl_spark.sources.readers import (
    SCAN_LAYOUT_MIN_ROWS,
    _scan_parallel_dir,
    load_table,
)


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-scan-layout")


def _write_customer(dir_path, n):
    t = pa.table(
        {
            "c_custkey": pa.array(range(n), pa.int64()),
            "c_name": pa.array([f"c{i}" for i in range(n)]),
            "c_nationkey": pa.array([i % 25 for i in range(n)], pa.int32()),
            "c_acctbal": pa.array([float(i) for i in range(n)], pa.float64()),
            "c_mktsegment": pa.array(["s"] * n),
        }
    )
    pq.write_table(t, str(dir_path / "customer.parquet"))


def test_small_source_not_rewritten(spark, tmp_path):
    _write_customer(tmp_path, SCAN_LAYOUT_MIN_ROWS - 1)
    assert (
        _scan_parallel_dir(spark, str(tmp_path / "customer.parquet"), "customer")
        is None
    )


def test_large_single_rowgroup_source_rewritten_row_identical(spark, tmp_path):
    n = SCAN_LAYOUT_MIN_ROWS + 500
    _write_customer(tmp_path, n)
    src = str(tmp_path / "customer.parquet")
    par = _scan_parallel_dir(spark, src, "customer")
    assert par is not None and "scan_parallel_customer_" in par
    df = load_table(spark, str(tmp_path), "customer")
    # the derived copy exists, is multi-file, and carries identical rows
    parts = [f for f in os.listdir(par) if f.endswith(".parquet")]
    assert len(parts) > 1
    got = sorted(
        (r["c_custkey"], r["c_acctbal"]) for r in df.collect()
    )
    assert got == [(i, float(i)) for i in range(n)]
    # scans of the derived layout parallelize beyond one task
    assert df.rdd.getNumPartitions() > 1


def test_kill_switch(spark, tmp_path, monkeypatch):
    _write_customer(tmp_path, SCAN_LAYOUT_MIN_ROWS + 500)
    monkeypatch.setenv("SPARK_GRAFT_SCAN_LAYOUT", "off")
    src = str(tmp_path / "customer.parquet")
    assert _scan_parallel_dir(spark, src, "customer") is None
