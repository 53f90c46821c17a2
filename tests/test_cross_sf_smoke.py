"""Cross-scale-factor smoke: every table loads at every SF with an
identical logical schema, and one cheap query per table family runs at
sf0.1 (otherwise only exercised by bench.py). This is the early-warning
net for driver-side testdata regenerations — the round-2 events.ts
physical-type switch would have failed here before it could zero a
correctness round."""

from __future__ import annotations

import pytest

from stream_cdc_spark.tables import TABLES, load

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def test_all_tables_load_with_consistent_schema(spark):
    for name in TABLES:
        schemas = []
        for sf in SF_DIRS:
            df = load(spark, sf, name)
            schemas.append((sf, tuple((f.name, f.dataType.simpleString()) for f in df.schema.fields)))
        baseline = schemas[0][1]
        for sf, sch in schemas[1:]:
            assert sch == baseline, (
                f"{name}: schema drift between {SF_DIRS[0]} and {sf}:\n"
                f"{baseline}\nvs\n{sch}"
            )


@pytest.mark.parametrize(
    "query",
    [
        "q01_envelope_filter_project",  # events scan + filter
        "q13_tpch_q1",  # lineitem aggregate
        "q19_exact_dedup",  # documents hash-groupBy
        "q43_ivf_cells",  # embeddings vector math
        "q55_tpch_q10",  # customer/orders/lineitem/nation join tree
    ],
)
def test_family_query_runs_at_sf01(spark, query):
    from stream_cdc_spark.plans.queries import QUERIES

    df = QUERIES[query].builder(spark, "/root/testdata/sf0.1")
    assert df.limit(5).count() > 0


def test_embedding_dimension_is_pinned(spark):
    """The ANN/near-dup queries build 64-dim hyperplanes (dim=64); a
    driver-side regeneration with a different embedding dimension would
    silently truncate every zip_with dot product instead of erroring.
    Catch it here first."""
    from pyspark.sql import functions as F

    for sf in SF_DIRS:
        emb = load(spark, sf, "embeddings")
        dims = emb.select(F.size("embedding").alias("d")).distinct().collect()
        assert [r.d for r in dims] == [64], f"{sf}: embedding dims {dims}"
