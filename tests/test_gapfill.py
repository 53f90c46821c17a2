"""Unit tests for hypertable-style gap-fill + LOCF
(temporal.bucket_last / temporal.gapfill_locf)."""

from __future__ import annotations

from datetime import datetime

from stream_cdc_spark.operators import temporal


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["key", "ts", "value", "seq"])


def test_bucket_last_picks_latest_by_ts_then_seq(spark):
    df = _ev(
        spark,
        [
            ("a", datetime(2024, 1, 1, 10, 5), 1.0, 1),
            ("a", datetime(2024, 1, 1, 10, 50), 2.0, 2),  # later ts wins
            ("b", datetime(2024, 1, 1, 10, 0), 5.0, 3),
            ("b", datetime(2024, 1, 1, 10, 0), 6.0, 4),  # same ts: seq wins
        ],
    )
    got = {
        (r["key"], r["bucket_ts"].hour): r["v"]
        for r in temporal.bucket_last(df, "key", "ts", "value", "seq").collect()
    }
    assert got == {("a", 10): 2.0, ("b", 10): 6.0}


def test_gapfill_dense_spine_locf_and_leading_null(spark):
    df = _ev(
        spark,
        [
            ("a", datetime(2024, 1, 1, 10, 0), 1.0, 1),
            ("a", datetime(2024, 1, 1, 13, 0), 4.0, 2),
            # key b first appears at hour 12 -> hours 10,11 are NULL for b
            ("b", datetime(2024, 1, 1, 12, 0), 9.0, 3),
        ],
    )
    out = temporal.gapfill_locf(df, "key", "ts", "value", "seq")
    got = {
        (r["key"], r["bucket_ts"].hour): (r["value_filled"], r["observed"])
        for r in out.collect()
    }
    # spine covers the GLOBAL range 10..13 for every key
    assert len(got) == 8
    assert got[("a", 10)] == (1.0, 1)
    assert got[("a", 11)] == (1.0, 0)  # gap carried forward
    assert got[("a", 12)] == (1.0, 0)
    assert got[("a", 13)] == (4.0, 1)
    assert got[("b", 10)] == (None, 0)  # before first observation: no back-fill
    assert got[("b", 11)] == (None, 0)
    assert got[("b", 12)] == (9.0, 1)
    assert got[("b", 13)] == (9.0, 0)
