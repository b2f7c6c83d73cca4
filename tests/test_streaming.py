"""Streaming ≡ batch equivalence: the streaming windowed/session/stateful
operators, driven to completion with availableNow over a file source,
must produce exactly the batch results on the same rows."""

from __future__ import annotations

import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from content_analytics_etl_spark.plans.events_queries import (
    events_session,
    events_tumbling,
)
from content_analytics_etl_spark.streaming import (
    running_user_totals,
    session_aggregate,
    stream_events,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


def _run_stream(df, name: str):
    q = (
        df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return name


def _rows(spark, name):
    return {tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}


def test_tumbling_stream_equals_batch(spark, sf_dir, events_dir):
    name = f"tumb_{uuid.uuid4().hex[:8]}"
    _run_stream(tumbling_counts(stream_events(spark, events_dir)), name)
    got = _rows(spark, name)
    want = {tuple(r) for r in events_tumbling(spark, sf_dir).collect()}
    assert got == want


def test_session_stream_equals_batch(spark, sf_dir, events_dir):
    name = f"sess_{uuid.uuid4().hex[:8]}"
    _run_stream(session_aggregate(stream_events(spark, events_dir)), name)
    got = _rows(spark, name)
    batch = events_session(spark, sf_dir).select(
        "user_id", "session_start", "session_end", "n_events", "total_value"
    )
    want = {tuple(r) for r in batch.collect()}
    assert got == want


def test_stateful_running_totals(spark, sf_dir, events_dir):
    name = f"state_{uuid.uuid4().hex[:8]}"
    q = (
        running_user_totals(stream_events(spark, events_dir))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["user_id"]: r for r in spark.sql(f"SELECT * FROM {name}").collect()}
    from content_analytics_etl_spark.sources.readers import load_table

    want = {
        r["user_id"]: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    # same key set and same counts; totals to float tolerance
    assert set(got) == set(want)
    for uid, r in want.items():
        assert got[uid]["n_events"] == r["n"]
        assert abs(got[uid]["total_value"] - r["tv"]) < 1e-6


def test_stream_stream_interval_join_equals_batch(spark, sf_dir, events_dir):
    from content_analytics_etl_spark.plans.temporal_queries import events_range_join
    from content_analytics_etl_spark.streaming.joins import view_click_conversions

    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        view_click_conversions(stream_events(spark, events_dir))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _rows(spark, name)
    want = {tuple(r) for r in events_range_join(spark, sf_dir).collect()}
    assert got == want


@pytest.fixture(scope="module")
def dup_events_dir(tmp_path_factory, sf_dir):
    """Events directory with every file duplicated — an at-least-once
    source: each event arrives exactly twice."""
    d = tmp_path_factory.mktemp("events_dup")
    shutil.copy(f"{sf_dir}/events.parquet", d / "events_a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", d / "events_b.parquet")
    return str(d)


def test_streaming_dedup_exact(spark, sf_dir, dup_events_dir):
    from content_analytics_etl_spark.sources.readers import load_table
    from content_analytics_etl_spark.streaming import dedup_stream_exact

    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        dedup_stream_exact(stream_events(spark, dup_events_dir), ["event_id"])
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _rows(spark, name)
    want = {tuple(r) for r in load_table(spark, sf_dir, "events").collect()}
    assert got == want  # each duplicated event emitted exactly once


def test_streaming_dedup_within_watermark(spark, sf_dir, dup_events_dir):
    from content_analytics_etl_spark.sources.readers import load_table
    from content_analytics_etl_spark.streaming import dedup_stream_within_watermark

    name = f"dedupw_{uuid.uuid4().hex[:8]}"
    q = (
        dedup_stream_within_watermark(
            stream_events(spark, dup_events_dir), ["event_id"], watermark="2 hours"
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _rows(spark, name)
    # duplicates arrive in the same batch (well inside the watermark
    # horizon), so the bounded-state variant also emits each event once
    want = {tuple(r) for r in load_table(spark, sf_dir, "events").collect()}
    assert got == want


def test_append_mode_emits_exactly_finalized_windows(spark, sf_dir, events_dir, tmp_path):
    """Watermark semantics at the sink: in append mode a window row may
    emit ONLY once the watermark (max event time − delay) passes its
    end — late-arriving data can no longer change it. The finalized set
    is deterministic for a fixed corpus: every batch tumbling window
    whose end ≤ max(ts) − 2 h, and nothing else (open windows stay in
    state and never reach the parquet sink)."""
    from pyspark.sql import functions as F

    from content_analytics_etl_spark.sources.readers import load_table

    out, ckpt = str(tmp_path / "win_out"), str(tmp_path / "ckpt")
    q = (
        tumbling_counts(stream_events(spark, events_dir))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = {tuple(r) for r in spark.read.parquet(out).collect()}

    e = load_table(spark, sf_dir, "events")
    max_ts = e.agg(F.max("ts")).collect()[0][0]
    batch = (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    finalized = {
        tuple(r)
        for r in batch.collect()
        if (max_ts - r["window_end"]).total_seconds() >= 2 * 3600
    }
    open_windows = {tuple(r) for r in batch.collect()} - finalized
    assert emitted == finalized and finalized
    assert not (emitted & open_windows)


def test_stream_defined_over_empty_directory(spark, tmp_path):
    """A stream must be definable before the first producer file lands
    (normal startup order); the ts-unit sniff falls back to µs instead
    of raising on an empty directory."""
    empty = tmp_path / "events_empty"
    empty.mkdir()
    stream = stream_events(spark, str(empty))
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"].startswith("timestamp")


def test_sketch_stream_equals_batch_registers(spark, sf_dir, events_dir):
    """Streaming LogLog register maintenance ≡ the batch register table
    row-for-row, and the merged all-days estimate computed FROM THE
    STREAMED STATE equals the batch rollup's total row — i.e. the
    dashboard never needs the raw events again."""
    from content_analytics_etl_spark.plans.events_queries import (
        day_registers,
        events_distinct_sketch_rollup,
    )
    from content_analytics_etl_spark.streaming import (
        estimate_from_registers,
        sketch_registers,
    )

    name = f"sk_{uuid.uuid4().hex[:8]}"
    _run_stream(sketch_registers(stream_events(spark, events_dir)), name)
    streamed = spark.sql(f"SELECT * FROM {name}")
    got = {tuple(r) for r in streamed.collect()}
    want = {
        tuple(r)
        for r in day_registers(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        ).collect()
    }
    assert got == want and got

    est = estimate_from_registers(streamed).collect()[0]["est_users"]
    total = [
        r
        for r in events_distinct_sketch_rollup(spark, sf_dir).collect()
        if r["day"] is None
    ][0]
    assert est == total["est_users"]


def test_sketch_stream_append_mode_emits_finalized_days(spark, sf_dir, events_dir):
    """Regression for the watermark-metadata bug: grouping the sketch by
    date_trunc instead of window(ts, '1 day') stripped event-time
    tracking, so append mode raised AnalysisException and state never
    evicted. With the window form, append emits exactly the days whose
    window end ≤ max(ts) − watermark, each matching the batch register
    rows."""
    from content_analytics_etl_spark.plans.events_queries import day_registers
    from content_analytics_etl_spark.streaming import (
        sketch_registers,
        stream_events,
    )

    name = f"ska_{uuid.uuid4().hex[:8]}"
    q = (
        sketch_registers(stream_events(spark, events_dir))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    watermark = max_ts - __import__("datetime").timedelta(hours=2)
    batch = day_registers(events).collect()
    finalized = {
        tuple(r)
        for r in batch
        if r["day"] + __import__("datetime").timedelta(days=1) <= watermark
    }
    assert got == finalized and got


def test_quantile_sketch_stream_equals_batch_bins(spark, sf_dir, events_dir):
    """Streaming per-(day, bin) histogram maintenance ≡ the batch
    quantile-sketch partials row-for-row — any day range's percentiles
    invert from the streamed state without replaying events."""
    from content_analytics_etl_spark.plans.events_queries import (
        qsketch_day_bins,
    )
    from content_analytics_etl_spark.streaming import (
        quantile_sketch_bins,
        stream_events,
    )

    name = f"qs_{uuid.uuid4().hex[:8]}"
    _run_stream(quantile_sketch_bins(stream_events(spark, events_dir)), name)
    got = {tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}
    want = {
        tuple(r)
        for r in qsketch_day_bins(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        ).collect()
    }
    assert got == want and got
