"""DuckDB-oracle comparison harness (mirrors the driver's t2 gate).

Runs a Spark DataFrame and a DuckDB SQL over the same parquet tables,
canonicalizes both results (columns sorted by name, rows sorted by all
columns, doubles and timestamps normalized) and asserts equality.
"""

from __future__ import annotations

import math
from datetime import datetime
from decimal import Decimal

import duckdb

from stream_cdc_spark.tables import TABLES, table_path


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — bit-identical doubles required
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def canonicalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def compare(spark_df, oracle_sql: str, sf_dir: str, check_order: bool = False):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)
    sc, srt = canonicalize(s_cols, s_rows)
    oc, ort = canonicalize(o_cols, o_rows)
    assert sc == oc, f"column mismatch: spark={sc} oracle={oc}"
    assert len(srt) == len(ort), f"row count: spark={len(srt)} oracle={len(ort)}"
    mism = [i for i, (a, b) in enumerate(zip(srt, ort)) if a != b]
    assert not mism, (
        f"{len(mism)} mismatched rows; first: spark={srt[mism[0]]} "
        f"oracle={ort[mism[0]]}"
    )
