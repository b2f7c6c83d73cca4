"""The driver's testdata generator has shipped ``events.ts`` as parquet
timestamp[ns] (rounds 1-2) AND timestamp[us] (round 3). The reader must
produce identical instants from either physical encoding — round 3
started with every events query silently reading 1970 dates because the
ns→µs conversion was applied to µs data. This pins the adaptive path.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from content_analytics_etl_spark.sources.readers import load_table, parquet_ts_unit

ROWS = {
    "event_id": [1, 2],
    "user_id": [10, 20],
    "event_type": ["view", "click"],
    "value": [1.5, 2.5],
    "props": ["{}", "{}"],
}
# 2024-01-15T12:34:56.789123 UTC
US = 1705322096789123


def _write(dir_path, unit: str) -> str:
    factor = {"us": 1, "ns": 1000}[unit]
    table = pa.table(
        {
            "event_id": pa.array(ROWS["event_id"], pa.int64()),
            "ts": pa.array([US * factor, (US + 1_000_000) * factor], pa.timestamp(unit)),
            "user_id": pa.array(ROWS["user_id"], pa.int64()),
            "event_type": pa.array(ROWS["event_type"]),
            "value": pa.array(ROWS["value"], pa.float64()),
            "props": pa.array(ROWS["props"]),
        }
    )
    out = str(dir_path / "events.parquet")
    pq.write_table(table, out)
    return str(dir_path)


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_load_table_events_ts_unit(spark, tmp_path, unit):
    sf_dir = _write(tmp_path, unit)
    assert parquet_ts_unit(f"{sf_dir}/events.parquet") == unit
    rows = load_table(spark, sf_dir, "events").orderBy("event_id").collect()
    assert [str(r["ts"]) for r in rows] == [
        "2024-01-15 12:34:56.789123",
        "2024-01-15 12:34:57.789123",
    ]
