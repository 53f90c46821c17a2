"""Schema-probe tests for tables.load: the driver's testdata generator has
shipped ``events.ts`` as parquet TIMESTAMP(NANOS) (round 1) and
TIMESTAMP(MICROS) (round 2), and the round-2 switch silently broke every
events query. These tests pin ``load()`` to yield session-tz TimestampType
with identical microsecond values for every physical shape the generator
might emit, so a regeneration can never zero the scoreboard again.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from stream_cdc_spark import tables

# 2024-03-01T12:34:56.789123456 — sub-microsecond tail exercises the
# nanos->micros truncation (DuckDB truncates the same way).
_NS_EPOCH = 1709296496789123456
_EXPECTED_US = dt.datetime(2024, 3, 1, 12, 34, 56, 789123)


def _write_events(tmpdir, ts_array: pa.Array) -> str:
    table = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7], pa.int64()),
            "event_type": pa.array(["click"], pa.string()),
            "value": pa.array([1.5], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    path = str(tmpdir.join("events.parquet"))
    pq.write_table(table, path, version="2.6", coerce_timestamps=None)
    return str(tmpdir)


@pytest.mark.parametrize(
    "arrow_type",
    [
        pa.timestamp("ns"),  # round-1 generator: TIMESTAMP(NANOS)
        pa.timestamp("us"),  # round-2 generator: TIMESTAMP(MICROS), NTZ
        pa.timestamp("us", tz="UTC"),  # UTC-adjusted MICROS
    ],
    ids=["nanos", "micros_ntz", "micros_utc"],
)
def test_load_events_ts_physical_types(spark, tmpdir, arrow_type):
    if arrow_type.unit == "ns":
        arr = pa.array([_NS_EPOCH], arrow_type)
    else:
        arr = pa.array([_EXPECTED_US], arrow_type)
    sf_dir = _write_events(tmpdir, arr)
    df = tables.load(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    row = df.collect()[0]
    assert row["ts"] == _EXPECTED_US


def test_load_real_testdata_ts_is_timestamp(spark):
    df = tables.load(spark, "/root/testdata/sf0.001", "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.limit(1).count() == 1


def test_footer_probe_classifies_physical_types(tmpdir):
    """The loader dispatches on the parquet footer (pyarrow), not on Spark's
    error message text."""
    ns_dir = tmpdir.mkdir("ns")
    us_dir = tmpdir.mkdir("us")
    _write_events(ns_dir, pa.array([_NS_EPOCH], pa.timestamp("ns")))
    _write_events(us_dir, pa.array([_EXPECTED_US], pa.timestamp("us")))
    assert tables._parquet_has_nanos(str(ns_dir.join("events.parquet"))) is True
    assert tables._parquet_has_nanos(str(us_dir.join("events.parquet"))) is False
    # directory form (multi-file Spark output) resolves via its part files
    assert tables._parquet_has_nanos(str(ns_dir)) is True
    # unprobeable path -> None so the caller can fall back
    assert tables._parquet_has_nanos(str(tmpdir.join("missing"))) is None


def test_nanos_load_independent_of_spark_error_text(spark, tmpdir, monkeypatch):
    """Round-3 advice: a Spark upgrade that rewords the Illegal-Parquet-type
    error must not break NANOS testdata. With the footer probe in place the
    message-sniff fallback is never consulted for a locally readable file —
    proven by making the fallback explode."""

    def _boom(spark_, path_):
        raise AssertionError("error-text sniff fallback must not be reached")

    monkeypatch.setattr(tables, "_read_parquet_sniff_fallback", _boom)
    sf_dir = _write_events(tmpdir, pa.array([_NS_EPOCH], pa.timestamp("ns")))
    df = tables.load(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.collect()[0]["ts"] == _EXPECTED_US


def test_nanos_conf_not_set_for_micros_data(spark, tmpdir):
    """Reading micros data must not flip the legacy nanosAsLong conf as a
    side effect (it is only set on demand when a NANOS file is seen)."""
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    sf_dir = _write_events(tmpdir, pa.array([_EXPECTED_US], pa.timestamp("us")))
    tables.load(spark, sf_dir, "events").collect()
    assert (
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        == "false"
    )
