"""Streaming CDC apply (streaming/cdc.py): change files merged into
versioned parquet snapshots via foreachBatch + merge_upsert — updates
win by seq, deletes remove keys, replays/no-op passes don't corrupt or
duplicate state."""

from __future__ import annotations

import json

from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from content_analytics_etl_spark.streaming.cdc import (
    apply_cdc_stream,
    latest_snapshot,
)

CHANGE_SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("val", LongType()),
        StructField("is_delete", BooleanType()),
        StructField("seq", LongType()),
    ]
)
TARGET_SCHEMA = StructType(
    [StructField("k", StringType()), StructField("val", LongType())]
)


def _change_file(path, name: str, rows: list[dict]) -> None:
    (path / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _state(spark, snap: str) -> dict[str, int]:
    rows = latest_snapshot(spark, snap, TARGET_SCHEMA).collect()
    return {r["k"]: r["val"] for r in rows}


def test_cdc_stream_upsert_delete_and_idempotent_rerun(spark, tmp_path):
    changes = tmp_path / "changes"
    changes.mkdir()
    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")

    _change_file(
        changes,
        "batch1.jsonl",
        [
            {"k": "a", "val": 1, "is_delete": False, "seq": 1},
            {"k": "b", "val": 2, "is_delete": False, "seq": 2},
        ],
    )
    apply_cdc_stream(
        spark, str(changes), snap, ckpt, key="k", change_schema=CHANGE_SCHEMA
    )
    assert _state(spark, snap) == {"a": 1, "b": 2}

    # update a (two rows — seq 11 must win), delete b, insert c
    _change_file(
        changes,
        "batch2.jsonl",
        [
            {"k": "a", "val": 10, "is_delete": False, "seq": 10},
            {"k": "a", "val": 11, "is_delete": False, "seq": 11},
            {"k": "b", "val": None, "is_delete": True, "seq": 12},
            {"k": "c", "val": 3, "is_delete": False, "seq": 13},
        ],
    )
    apply_cdc_stream(
        spark, str(changes), snap, ckpt, key="k", change_schema=CHANGE_SCHEMA
    )
    assert _state(spark, snap) == {"a": 11, "c": 3}

    # a third pass with no new files must leave the state untouched
    apply_cdc_stream(
        spark, str(changes), snap, ckpt, key="k", change_schema=CHANGE_SCHEMA
    )
    assert _state(spark, snap) == {"a": 11, "c": 3}


def test_cdc_fresh_checkpoint_against_existing_snapshot_fails_loudly(
    spark, tmp_path
):
    """A reset checkpoint restarts batch ids at 0; merging batch 0 from
    an empty base would silently discard the existing snapshot, so the
    apply loop must raise instead (streaming wraps it in its own error)."""
    changes = tmp_path / "changes"
    changes.mkdir()
    snap = str(tmp_path / "snapshot")

    _change_file(
        changes, "b1.jsonl", [{"k": "a", "val": 1, "is_delete": False, "seq": 1}]
    )
    apply_cdc_stream(
        spark, str(changes), snap, str(tmp_path / "ckpt1"),
        key="k", change_schema=CHANGE_SCHEMA,
    )
    _change_file(
        changes, "b2.jsonl", [{"k": "b", "val": 2, "is_delete": False, "seq": 2}]
    )
    apply_cdc_stream(
        spark, str(changes), snap, str(tmp_path / "ckpt1"),
        key="k", change_schema=CHANGE_SCHEMA,
    )
    assert _state(spark, snap) == {"a": 1, "b": 2}

    # fresh checkpoint, same snapshot: versions 0 and 1 exist > batch 0
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="reset independently"):
        apply_cdc_stream(
            spark, str(changes), snap, str(tmp_path / "ckpt2"),
            key="k", change_schema=CHANGE_SCHEMA,
        )
    # existing state untouched by the failed pass
    assert _state(spark, snap) == {"a": 1, "b": 2}
