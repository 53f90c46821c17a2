"""Semantics tests for sequential event analytics (funnel, retention) and
the new corpus-statistics operators — planted inputs with hand-computed
answers, independent of the DuckDB oracle harness."""

from __future__ import annotations

import hashlib
from datetime import datetime

from stream_cdc_spark.operators import analytics, dedup, sampling, text


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, _ts(t), et) for u, t, et in rows],
        "user_id bigint, ts timestamp, event_type string",
    )


STEPS = ["signup", "click", "purchase"]


def test_funnel_reached_min_chaining(spark):
    ev = _events(
        spark,
        [
            # u1: full funnel in order
            (1, "2026-01-01T00:00:00", "signup"),
            (1, "2026-01-01T00:01:00", "click"),
            (1, "2026-01-01T00:02:00", "purchase"),
            # u2: click BEFORE signup doesn't count; no click after -> 1
            (2, "2026-01-01T00:00:00", "click"),
            (2, "2026-01-01T00:01:00", "signup"),
            # u3: click at the SAME timestamp as signup — strict 'after'
            (3, "2026-01-01T00:00:00", "signup"),
            (3, "2026-01-01T00:00:00", "click"),
            # u4: noise events interleaved, steps out of adjacency still chain
            (4, "2026-01-01T00:00:00", "signup"),
            (4, "2026-01-01T00:00:30", "purchase"),  # too early for step 3
            (4, "2026-01-01T00:01:00", "click"),
            (4, "2026-01-01T00:03:00", "purchase"),
            # u5: never signs up
            (5, "2026-01-01T00:00:00", "view"),
        ],
    )
    got = {
        r.user_id: r.reached
        for r in analytics.funnel_reached(ev, STEPS).collect()
    }
    # u5 has no step events at all -> filtered before the grouping
    assert got == {1: 3, 2: 1, 3: 1, 4: 3}


def test_funnel_counts_are_cumulative(spark):
    ev = _events(
        spark,
        [
            (1, "2026-01-01T00:00:00", "signup"),
            (1, "2026-01-01T00:01:00", "click"),
            (1, "2026-01-01T00:02:00", "purchase"),
            (2, "2026-01-01T00:00:00", "signup"),
            (2, "2026-01-01T00:01:00", "click"),
            (3, "2026-01-01T00:00:00", "signup"),
        ],
    )
    rows = analytics.funnel_counts(ev, STEPS).collect()
    assert [(r.step, r.step_name, r.n_users) for r in rows] == [
        (1, "signup", 3),
        (2, "click", 2),
        (3, "purchase", 1),
    ]


def test_retention_cohorts_triangle(spark):
    ev = _events(
        spark,
        [
            # cohort 01-01: u1 active day 0 and day 2; u2 active day 0 only
            (1, "2026-01-01T08:00:00", "view"),
            (1, "2026-01-03T09:00:00", "view"),
            (1, "2026-01-03T10:00:00", "click"),  # same day counted once
            (2, "2026-01-01T12:00:00", "view"),
            # cohort 01-02: u3 day 0 and day 9 (past the 7-day horizon)
            (3, "2026-01-02T00:00:00", "view"),
            (3, "2026-01-11T00:00:00", "view"),
        ],
    )
    rows = analytics.retention_cohorts(ev, max_offset_days=7).collect()
    got = {(str(r.cohort_day), r.day_offset): r.n_active for r in rows}
    assert got == {
        ("2026-01-01", 0): 2,
        ("2026-01-01", 2): 1,
        ("2026-01-02", 0): 1,
    }


def test_duplicated_spans_cross_doc(spark):
    shared = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [
            (10, f"one two {shared} x y"),
            (20, f"p q r {shared} s"),
            (30, "totally unrelated words here only once"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r.shingle: (r.df, r.example_id)
        for r in dedup.duplicated_spans(docs, k=4, min_df=2).collect()
    }
    assert got == {shared: (2, 10)}


def test_bigram_lm_exact_probabilities(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id bigint, text string"
    )
    # bigrams: doc1 -> (a,b) (b,a) (a,b); doc2 -> (a,c)
    got = {
        (r.w1, r.w2): (r.n, r.p_q) for r in text.bigram_lm(docs).collect()
    }
    assert got == {
        ("a", "b"): (2, 666666),  # 2 of 3 'a'-led bigrams
        ("a", "c"): (1, 333333),
        ("b", "a"): (1, 1000000),
    }


def test_shard_balance_audit_totals_and_assignment(spark):
    docs = spark.createDataFrame(
        [(i, 10 * (i + 1)) for i in range(200)], "doc_id bigint, n_chars bigint"
    )
    audit = sampling.shard_balance_audit(
        docs, key="doc_id", weight_col="n_chars"
    ).collect()
    assert sum(r.n_rows for r in audit) == 200
    assert sum(r.total_weight for r in audit) == sum(10 * (i + 1) for i in range(200))
    # assignment is content-addressed: recompute one row's shard in Python
    shard_of_0 = hashlib.md5(b"0").hexdigest()[:2]
    row = next(r for r in audit if r.shard == shard_of_0)
    assert row.n_rows >= 1


def test_profile_columns_exact_and_approx(spark):
    from stream_cdc_spark.operators import profiling

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "b")], "k bigint, s string"
    )
    got = {
        r.col_name: r
        for r in profiling.profile_columns(df, ["k", "s"]).collect()
    }
    assert (got["k"].n_rows, got["k"].n_nulls, got["k"].n_distinct) == (4, 0, 4)
    assert (got["k"].min_value, got["k"].max_value) == ("1", "4")
    # nulls excluded from distinct and min/max, counted in n_nulls
    assert (got["s"].n_rows, got["s"].n_nulls, got["s"].n_distinct) == (4, 1, 2)
    assert (got["s"].min_value, got["s"].max_value) == ("a", "b")
    # HLL mode: same schema, exact stats unchanged, distinct approximately right
    approx = {
        r.col_name: r
        for r in profiling.profile_columns(
            df, ["k", "s"], exact_distinct=False
        ).collect()
    }
    assert approx["s"].n_nulls == 1 and 1 <= approx["s"].n_distinct <= 3
