"""Structured Streaming: file-source windowed aggregation must converge
to the batch twin's answer once all input is processed."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from fp_data_lakehouse_spark.operators.eventops import ev01_hourly_tumbling_counts
from fp_data_lakehouse_spark.streaming import run_stream_to_memory

from .conftest import SF_ORACLE


@pytest.fixture(scope="module")
def events_dir():
    tmp = tempfile.mkdtemp(prefix="events_stream_")
    shutil.copy(f"{SF_ORACLE}/events.parquet", f"{tmp}/events.parquet")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def _rows(df_or_rows):
    return sorted(
        (r.win_start_epoch, r.event_type, r.n_events, getattr(r, "avg_value", None))
        for r in df_or_rows
    )


def test_tumbling_stream_converges_to_batch(spark, events_dir):
    q = run_stream_to_memory(spark, events_dir, "tumbling_test", variant="tumbling")
    try:
        got = _rows(spark.sql("SELECT * FROM tumbling_test").collect())
    finally:
        q.stop()
    want = _rows(ev01_hourly_tumbling_counts(spark, SF_ORACLE).collect())
    assert got == want


def test_sliding_stream_windows_overlap(spark, events_dir):
    q = run_stream_to_memory(spark, events_dir, "sliding_test", variant="sliding")
    try:
        rows = spark.sql("SELECT * FROM sliding_test").collect()
    finally:
        q.stop()
    # every event lands in 4 overlapping windows -> total count x4
    total_sliding = sum(r.n_events for r in rows)
    total_events = spark.read.parquet(f"{SF_ORACLE}/events.parquet").count()
    assert total_sliding == 4 * total_events
    # window starts align to the 15-minute slide grid
    assert all(r.win_start_epoch % 900 == 0 for r in rows)
