"""User-defined function surface: scalar pandas UDFs, grouped-agg UDFs,
grouped-map transforms, and a Python UDTF.

The reference's entire extension surface is FilterLike (filter(dict)->dict,
stream_cdc/filters/base.py:22-33) — row-at-a-time Python. Here the same
extensibility is Arrow-vectorized: every entry point batches through pandas
(10-100x row-at-a-time Python) and is registered by name (O28-style) so
config-driven pipelines can reference them.

These exist for logic that genuinely needs Python (models, libraries);
anything expressible as Column expressions should stay JVM-side — the
equivalence tests in tests/test_udfs.py make the cost visible by computing
the same result both ways.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType, StringType


# -- scalar pandas UDFs (vectorized per Arrow batch) ------------------------


@pandas_udf(DoubleType())
def quality_score_udf(text: pd.Series) -> pd.Series:
    """Vectorized quality score — pandas twin of operators.text
    quality_score (same decision function), for pipelines that need to mix
    the score into Python-side logic."""
    toks = text.str.split(" ")
    n_tok = toks.str.len().astype("float64")
    no_space = text.str.replace(" ", "", regex=False).str.len().astype("float64")
    stop = toks.map(
        lambda ts: sum(t in {"the", "a", "of", "and", "to", "in", "is"} for t in ts)
    ).astype("float64")
    avg_len = no_space / n_tok
    score = (
        ((n_tok >= 10) & (n_tok <= 100000)).astype("float64") * 0.5
        + (stop > 0).astype("float64") * 0.25
        + ((avg_len >= 2.0) & (avg_len <= 12.0)).astype("float64") * 0.25
    )
    return score


@pandas_udf(LongType())
def token_count_udf(text: pd.Series) -> pd.Series:
    return text.str.split(" ").str.len().astype("int64")


# -- grouped-aggregate pandas UDF (UDAF) ------------------------------------


@pandas_udf(DoubleType())
def median_udaf(v: pd.Series) -> float:
    """Grouped-agg pandas UDF: exact per-group median (UDAF surface)."""
    return float(v.median())


# -- grouped-map transform (applyInPandas) ----------------------------------


def zscore_per_group(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group z-score normalization via applyInPandas (grouped map).

    The group's whole batch lands in one pandas frame — the escape hatch
    for per-group logic that needs the full group (model fits, rank
    transforms). Groups must fit in executor memory; salt or pre-aggregate
    hot groups first (operators/skew.py).
    """
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        list(df.schema.fields) + [StructField("zscore", DoubleType())]
    )

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        sd = v.std(ddof=0)
        pdf = pdf.copy()
        pdf["zscore"] = (v - v.mean()) / sd if sd > 0 else 0.0
        return pdf

    return df.groupBy(group_col).applyInPandas(_z, schema=schema)


# -- Python UDTF (table function) -------------------------------------------


def make_shingle_udtf(spark):
    """Register and return a UDTF exploding word k-shingles: the UDTF
    surface (one input row -> many output rows with schema)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, shingle: string")
    class ShingleUDTF:
        def eval(self, text: str, k: int):
            if text is None:
                return
            toks = text.split(" ")
            for i in range(max(0, len(toks) - k + 1)):
                yield i, " ".join(toks[i : i + k])

    spark.udtf.register("shingles_udtf", ShingleUDTF)
    return ShingleUDTF


# -- named registry (O28-style) --------------------------------------------

udf_registry: dict[str, Callable] = {
    "quality_score": quality_score_udf,
    "token_count": token_count_udf,
    "median": median_udaf,
}
