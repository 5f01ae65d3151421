"""Fixture-schema robustness: the events fixture's ts physical type has
changed across driver generations (int64 nanos -> timestamp[us]/NTZ),
and each change broke readers written against the previous one (the
round-2 regression cluster). load_table and read_events_stream must
normalize EVERY plausible physical encoding to one TimestampType column
with identical instants."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fp_data_lakehouse_spark.sources.catalog import load_table

_EPOCHS_US = [1_700_000_000_000_000, 1_700_000_123_456_789, 1_700_003_600_000_000]


def _write_events(tmpdir: str, ts_array: pa.Array) -> str:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 11, 10], pa.int64()),
            "event_type": pa.array(["click", "error", "purchase"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(table, f"{tmpdir}/events.parquet")
    return tmpdir


@pytest.mark.parametrize(
    "encoding,ts_array",
    [
        ("int64_nanos", pa.array([e * 1000 for e in _EPOCHS_US], pa.int64())),
        ("timestamp_us_ntz", pa.array(_EPOCHS_US, pa.timestamp("us"))),
        ("timestamp_us_utc", pa.array(_EPOCHS_US, pa.timestamp("us", tz="UTC"))),
        ("timestamp_ns_ntz", pa.array([e * 1000 for e in _EPOCHS_US], pa.timestamp("ns"))),
    ],
)
def test_load_table_normalizes_every_ts_encoding(spark, tmp_path, encoding, ts_array):
    d = _write_events(str(tmp_path), ts_array)
    df = load_table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", encoding
    got = sorted(
        r.ep for r in df.selectExpr("unix_micros(ts) AS ep").collect()
    )
    assert got == sorted(_EPOCHS_US), encoding


def test_orders_ntz_orderdate_normalized(spark, tmp_path):
    table = pa.table(
        {
            "o_orderkey": pa.array([1], pa.int64()),
            "o_custkey": pa.array([7], pa.int64()),
            "o_orderstatus": pa.array(["O"]),
            "o_totalprice": pa.array([10.0], pa.float64()),
            "o_orderdate": pa.array(
                [datetime.datetime(1996, 1, 2)], pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(["1-URGENT"]),
        }
    )
    pq.write_table(table, f"{tmp_path}/orders.parquet")
    df = load_table(spark, str(tmp_path), "orders")
    assert dict(df.dtypes)["o_orderdate"] == "timestamp"
    assert df.selectExpr("unix_timestamp(o_orderdate) AS ep").collect()[0].ep == 820540800
