"""Schema evolution for the materialized CDC tables.

The reference decodes DDL (QueryEvent) and then drops it
(stream_cdc/datasources/mysql.py:354-365) — downstream consumers discover
schema change only when payload keys shift. A lakehouse-side engine can do
better with public Spark mechanics:

- ADDITIVE evolution (new nullable columns) is safe: parquet footers keep
  per-file schemas, `mergeSchema` unions them, and old files read the new
  column as NULL. That is the contract `read_evolving` provides.
- DESTRUCTIVE evolution (dropped columns, type changes) silently corrupts
  consumers; `assert_compatible` is the ingest-time gate that refuses it,
  which is exactly the decision the reference punts on by discarding DDL.

Scale note: `mergeSchema` reads EVERY file footer at planning time — at
100 TB that is millions of footer reads per query. Use it at ingest
boundaries to detect drift, then rewrite the canonical schema into the
table's metadata (or a catalog) so steady-state reads pin a single schema.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet table whose files span additive schema versions:
    the union schema, with NULLs where old files lack new columns."""
    return spark.read.option("mergeSchema", "true").parquet(path)


@dataclass(frozen=True)
class SchemaDiff:
    added: tuple[str, ...] = field(default=())
    removed: tuple[str, ...] = field(default=())
    type_changed: tuple[tuple[str, str, str], ...] = field(default=())

    @property
    def additive_only(self) -> bool:
        return not self.removed and not self.type_changed


def schema_diff(old: T.StructType, new: T.StructType) -> SchemaDiff:
    """Field-level diff (top level; nested structs compare as whole types,
    the conservative choice for a compatibility gate)."""
    o = {f.name: f.dataType for f in old.fields}
    n = {f.name: f.dataType for f in new.fields}
    return SchemaDiff(
        added=tuple(sorted(set(n) - set(o))),
        removed=tuple(sorted(set(o) - set(n))),
        type_changed=tuple(
            sorted(
                (name, o[name].simpleString(), n[name].simpleString())
                for name in set(o) & set(n)
                if o[name] != n[name]
            )
        ),
    )


def assert_compatible(old: T.StructType, new: T.StructType) -> SchemaDiff:
    """Ingest-time evolution gate: allow added nullable columns, refuse
    removals and type changes. Returns the diff for logging/metrics."""
    d = schema_diff(old, new)
    if not d.additive_only:
        raise ValueError(
            "incompatible schema evolution: "
            f"removed={list(d.removed)} type_changed={list(d.type_changed)}"
        )
    return d
