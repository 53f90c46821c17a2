"""Every declared query with an oracle must hash-match DuckDB (driver t2
gate, run here at sf0.001 for speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from stream_cdc_spark.plans.queries import QUERIES
from tests.conftest import SF_SMALL
from tests.oracle import compare

ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in QUERIES.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, name):
    spec = QUERIES[name]
    compare(spec.builder(spark, SF_SMALL), spec.oracle, SF_SMALL)


def test_no_rows_only_queries_remain():
    """Every registered query is value-checked against a DuckDB oracle.
    The formerly rows-only sketches (MinHash-LSH, SimHash, hyperplane ANN,
    IVF top-k) were reformulated candidate-then-verify in round 3; any new
    query must ship with an oracle or consciously extend this list."""
    assert ROWS_ONLY == [], f"rows-only queries reintroduced: {ROWS_ONLY}"


def test_oracle_output_types_are_transport_safe():
    """DuckDB HUGEINT/DECIMAL outputs convert inconsistently across result
    transports (int vs float vs Decimal) — every oracle column must be a
    plain BIGINT/INT/DOUBLE/VARCHAR/TIMESTAMP/BOOLEAN so the driver's
    comparison cannot drift."""
    import duckdb

    from stream_cdc_spark.tables import TABLES, table_path

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF_SMALL, t)}'"
        )
    allowed_prefixes = ("BIGINT", "INTEGER", "DOUBLE", "FLOAT", "VARCHAR",
                        "TIMESTAMP", "BOOLEAN", "DATE")
    offenders = []
    for name in ORACLE_QUERIES:
        cur = con.execute(f"DESCRIBE {QUERIES[name].oracle}")
        for col, typ, *_ in cur.fetchall():
            if not str(typ).startswith(allowed_prefixes):
                offenders.append((name, col, str(typ)))
    assert not offenders, f"transport-fragile oracle output types: {offenders}"


@pytest.mark.slow
def test_spark_and_oracle_schemas_pairwise_consistent(spark):
    """Column names must match exactly and types must map 1:1 between the
    Spark result and the DuckDB oracle result for every query — the
    driver's schema comparison must never be the thing that fails."""
    import duckdb

    from pyspark.sql import types as T

    from stream_cdc_spark.tables import TABLES, table_path

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF_SMALL, t)}'")
    type_map = {
        "BIGINT": (T.LongType,),
        "INTEGER": (T.IntegerType,),
        "DOUBLE": (T.DoubleType,),
        "VARCHAR": (T.StringType,),
        "TIMESTAMP": (T.TimestampType, T.TimestampNTZType),
        "BOOLEAN": (T.BooleanType,),
        "DATE": (T.DateType,),
    }
    problems = []
    for name in ORACLE_QUERIES:
        o_schema = {
            col: str(typ)
            for col, typ, *_ in con.execute(f"DESCRIBE {QUERIES[name].oracle}").fetchall()
        }
        s_schema = {f.name: f.dataType for f in QUERIES[name].builder(spark, SF_SMALL).schema.fields}
        if set(o_schema) != set(s_schema):
            problems.append((name, "columns", sorted(o_schema), sorted(s_schema)))
            continue
        for col, o_typ in o_schema.items():
            expected = type_map.get(o_typ.split("(")[0])
            if expected and not isinstance(s_schema[col], expected):
                problems.append((name, col, o_typ, str(s_schema[col])))
    assert not problems, f"schema drift: {problems}"


@pytest.mark.slow
@pytest.mark.parametrize(
    "name",
    [
        "q27_minhash_lsh_pairs",
        "q28_simhash_near_pairs",
        "q29_ann_lsh_topk",
        "q30_embedding_near_dup",
        "q44_ivf_ann_topk",
    ],
)
def test_sketch_oracle_holds_at_sf01(spark, name):
    """The candidate-then-verify sketch queries claim 100% sketch recall as
    part of their oracle match. Prove it holds at sf0.1 (100x the repo
    suite's default, 10x the driver's gate) — where q28 also meets genuine
    duplicate-text groups, not just planted ones."""
    spec = QUERIES[name]
    compare(spec.builder(spark, "/root/testdata/sf0.1"), spec.oracle,
            "/root/testdata/sf0.1")
