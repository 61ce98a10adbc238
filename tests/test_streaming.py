"""Streaming tests: incremental execution must agree with the batch twins
(whose logic the DuckDB oracle already certifies)."""

from __future__ import annotations

from osm2orc_spark.queries.relational import tumbling_window_hourly
from osm2orc_spark.streaming.events import (
    hourly_rollup_stream,
    read_events_stream,
    run_to_memory,
    session_window_stream,
)


def test_hourly_rollup_stream_matches_batch(spark, sf_smoke):
    events = read_events_stream(spark, f"{sf_smoke}/events.parquet")
    result = run_to_memory(hourly_rollup_stream(events), "hourly_out")
    batch = tumbling_window_hourly(spark, sf_smoke)
    got = {tuple(r) for r in result.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want


def test_session_window_stream_counts(spark, sf_smoke):
    events = read_events_stream(spark, f"{sf_smoke}/events.parquet")
    result = run_to_memory(session_window_stream(events), "session_out")
    rows = result.collect()
    assert rows
    # every event lands in exactly one session
    assert sum(r["n_events"] for r in rows) == 1000
    # session bounds are ordered and per-user
    assert all(r["session_start"] <= r["session_end"] for r in rows)
