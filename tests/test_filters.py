"""Filter-chain tests mirroring the reference's
tests/unit/filters/test_filter_base.py (chain ordering, empty-chain
identity, duck typing) and the integration-test filters (redact + size
claim-check)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_cdc_spark.filters import (
    FilterChain,
    RedactFilter,
    SizeFilter,
    filter_registry,
)
from tests.conftest import SF_SMALL


def _events(spark):
    from stream_cdc_spark.tables import load

    return load(spark, SF_SMALL, "events")


def test_empty_chain_identity(spark):
    df = _events(spark)
    out = FilterChain().apply(df)
    assert out.schema == df.schema
    assert out.count() == df.count()


def test_chain_order_matters(spark):
    df = spark.createDataFrame([("hello",)], ["v"])
    upper = lambda d: d.withColumn("v", F.upper("v"))
    suffix = lambda d: d.withColumn("v", F.concat("v", F.lit("!")))
    a = FilterChain([upper, suffix]).apply(df).collect()[0].v
    b = FilterChain([suffix, upper]).apply(df).collect()[0].v
    assert a == "HELLO!"
    assert b == "HELLO!"  # upper after suffix uppercases the suffix too
    # order-sensitive case:
    redact_then_upper = FilterChain(
        [RedactFilter("v", "x"), upper]
    ).apply(df).collect()[0].v
    upper_then_redact = FilterChain(
        [upper, RedactFilter("v", "x")]
    ).apply(df).collect()[0].v
    assert redact_then_upper == "X"
    assert upper_then_redact == "x"


def test_duck_typed_filter(spark):
    class Custom:  # no inheritance — duck typing like the reference
        def apply(self, df):
            return df.filter(F.col("event_type") == "click")

    df = _events(spark)
    out = FilterChain([Custom()]).apply(df)
    assert out.count() == df.filter("event_type = 'click'").count()


def test_redact_conditional(spark):
    df = _events(spark)
    out = RedactFilter(
        "props", "[REDACTED]", when=F.col("event_type") == "error"
    ).apply(df)
    redacted = out.filter("props = '[REDACTED]'").count()
    assert redacted == df.filter("event_type = 'error'").count()


def test_size_filter_claim_check(spark):
    df = spark.createDataFrame([("small",), ("x" * 2000,)], ["payload"])
    out = SizeFilter("payload", field_threshold=1000).apply(df).collect()
    vals = sorted(r.payload for r in out)
    assert vals[0] == "small"
    assert vals[1].startswith("store://") and len(vals[1]) < 100


def test_registry_case_insensitive_and_errors():
    f = filter_registry.create("REDACT", column="x")
    assert isinstance(f, RedactFilter)
    try:
        filter_registry.create("nope")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "unsupported filter" in str(e)
