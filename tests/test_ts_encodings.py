"""The driver's testdata has shipped `events.ts` as TIMESTAMP(NANOS) (reads
as bigint under nanosAsLong), TIMESTAMP(MICROS, isAdjustedToUTC=false)
(reads as timestamp_ntz), and tz-adjusted micros across rounds.
sources/tables.load_table must normalize all three to the same ts_us — this
pins that contract so the next encoding flip is a test failure, not a
round-long red driver gate."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from big_data_analytics_mini_projects_spark.sources.tables import load_table

#: three logical instants, as epoch microseconds
INSTANTS_US = [1_700_000_000_000_000, 1_700_000_123_456_789, 1_700_086_400_000_000]


def _write(tmpdir: str, unit: str, tz: str | None) -> str:
    sf_dir = os.path.join(tmpdir, f"enc_{unit}_{tz or 'naive'}")
    os.makedirs(sf_dir, exist_ok=True)
    scale = {"us": 1, "ns": 1000}[unit]
    arr = pa.array([v * scale for v in INSTANTS_US], pa.timestamp(unit, tz=tz))
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": arr,
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["a", "b", "c"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


@pytest.mark.parametrize(
    "unit,tz",
    [("ns", None), ("us", None), ("us", "UTC")],
    ids=["nanos-as-bigint", "micros-ntz", "micros-utc"],
)
def test_load_table_normalizes_every_ts_encoding(spark, tmp_path, unit, tz):
    sf_dir = _write(str(tmp_path), unit, tz)
    df = load_table(spark, sf_dir, "events")
    got = sorted(r["ts_us"] for r in df.select("ts_us").collect())
    assert got == sorted(INSTANTS_US), (unit, tz)
    # the rebuilt ts column must be event-time-windowable (plain timestamp)
    assert dict(df.dtypes)["ts"] == "timestamp"


@pytest.mark.parametrize(
    "unit,tz",
    [("ns", None), ("us", None), ("us", "UTC")],
    ids=["nanos-as-bigint", "micros-ntz", "micros-utc"],
)
def test_events_stream_normalizes_every_ts_encoding(spark, tmp_path, unit, tz):
    from big_data_analytics_mini_projects_spark.streaming.stream_stats import (
        events_stream,
        run_available_now,
    )

    sf_dir = _write(str(tmp_path), unit, tz)
    sdf = events_stream(spark, sf_dir)
    out = run_available_now(sdf.select("ts_us"), output_mode="append")
    assert sorted(r["ts_us"] for r in out.collect()) == sorted(INSTANTS_US), (unit, tz)
