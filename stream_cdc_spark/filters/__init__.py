"""Filter chain — the engine's user-extension surface.

Reference contract (citations into /root/reference/):
  FilterLike protocol: any object with filter(message)->message participates
    (stream_cdc/filters/base.py:22-33; duck typing tested at
    tests/unit/filters/test_filter_base.py:51-66)
  FilterChain.apply: sequential composition, output of one feeding the next
    (filters/base.py:58-98); empty chain is identity
  Filter factory/registry (filters/factory.py:14-25)
  Example filters from the integration test
    (tests/integration/simple_integration_test.py:15-49): Redact, Size.

Spark realization: a filter is a ``DataFrame -> DataFrame`` transform.
Chain application is ``df.transform(f1).transform(f2)...`` — Catalyst fuses
the chained narrow maps into one whole-stage-codegen'd projection, so an
N-filter chain costs the same as one. Python-logic filters plug in as
pandas UDFs (Arrow-vectorized), mirroring the reference's arbitrary-dict
escape hatch without per-row Python.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Protocol, runtime_checkable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DataFrameTransform = Callable[[DataFrame], DataFrame]


@runtime_checkable
class FilterLike(Protocol):
    """Anything with apply(df)->df participates (duck-typed, like the
    reference's filter(dict)->dict protocol)."""

    def apply(self, df: DataFrame) -> DataFrame: ...


class FilterChain:
    """Sequential filter composition (filters/base.py:58-98)."""

    def __init__(self, filters: list[FilterLike | DataFrameTransform] | None = None):
        self.filters = list(filters or [])

    def add(self, f: FilterLike | DataFrameTransform) -> "FilterChain":
        self.filters.append(f)
        return self

    def apply(self, df: DataFrame) -> DataFrame:
        for f in self.filters:
            df = f.apply(df) if hasattr(f, "apply") else f(df)
        return df


class RedactFilter:
    """Replace matching column values with a constant (integration test
    RedactFilter, simple_integration_test.py:15-22)."""

    def __init__(self, column: str, replacement: str = "[REDACTED]", when: Column | None = None):
        self.column, self.replacement, self.when = column, replacement, when

    def apply(self, df: DataFrame) -> DataFrame:
        cond = self.when if self.when is not None else F.lit(True)
        return df.withColumn(
            self.column,
            F.when(cond, F.lit(self.replacement)).otherwise(F.col(self.column)),
        )


class SizeFilter:
    """Claim-check offload for large string fields (integration test
    SizeFilter, simple_integration_test.py:25-49): fields longer than
    `field_threshold` chars are replaced by a storage URI built from a
    deterministic content hash.

    Two tiers, same URIs:

    - ``store=None`` (default): routing-only — pure Column expression
      (whole-stage codegen, zero Python) that substitutes the URI without
      persisting the payload. Use when a downstream sink (QueueSink) owns
      the actual offload, or for plan-shape tests.
    - ``store=FileClaimCheckStore(...)``: the offload is real — an
      Arrow-batched pandas UDF writes each oversized payload to the store
      *before* substituting the URI, so ``store.get_text(uri)`` recovers
      the original (reference recoverability contract,
      simple_integration_test.py:25-49). Content-addressed writes are
      idempotent, so Spark task retries/speculation are safe.

    Both tiers produce byte-identical output columns (URI =
    ``prefix + sha256(payload)``), verified by test_filters roundtrip.
    """

    def __init__(
        self,
        column: str,
        field_threshold: int = 1000,
        store_prefix: str = "store://",
        store=None,
    ):
        self.column, self.threshold, self.prefix = column, field_threshold, store_prefix
        self.store = store
        if store is not None and getattr(store, "prefix", store_prefix) != store_prefix:
            raise ValueError(
                f"store prefix {store.prefix!r} != filter prefix {store_prefix!r}"
            )

    def apply(self, df: DataFrame) -> DataFrame:
        c = F.col(self.column)
        if self.store is None:
            uri = F.concat(F.lit(self.prefix), F.sha2(c, 256))
            return df.withColumn(
                self.column, F.when(F.length(c) > self.threshold, uri).otherwise(c)
            )

        store, threshold = self.store, self.threshold

        @F.pandas_udf("string")
        def _offload(s: pd.Series) -> pd.Series:
            return s.map(
                lambda v: store.put_text(v)
                if v is not None and len(v) > threshold
                else v
            )

        return df.withColumn(self.column, _offload(c))


class _FilterRegistry:
    """Name -> filter-class registry with case-insensitive lookup
    (factory contract: filters/factory.py:14-25, registries O28)."""

    def __init__(self) -> None:
        self._reg: dict[str, type] = {}

    def register(self, name: str, cls: type) -> None:
        self._reg[name.lower()] = cls

    def create(self, name: str, **kwargs) -> FilterLike:
        key = name.lower()
        if key not in self._reg:
            raise ValueError(
                f"unsupported filter type: {name!r}; registered: {sorted(self._reg)}"
            )
        return self._reg[key](**kwargs)

    def names(self) -> list[str]:
        return sorted(self._reg)


filter_registry = _FilterRegistry()
filter_registry.register("redact", RedactFilter)
filter_registry.register("size", SizeFilter)
