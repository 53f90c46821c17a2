"""Unit tests for C4-style duplicated-segment removal
(dedup.remove_duplicated_segments / doc_blocks).

Reference parity note: the reference rewrites single events via its filter
chain (stream_cdc/filters/); the corpus-level rewrite has no reference
counterpart and follows Raffel et al. 2020 (C4) span removal semantics at
block granularity.
"""

from __future__ import annotations

from stream_cdc_spark.operators import dedup


def _rows(df):
    return {r["doc_id"]: (r["clean_text"], r["removed_blocks"]) for r in df.collect()}


def test_block_tiling_with_trailing_partial(spark):
    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    got = sorted(
        (r["blk"], r["btext"])
        for r in dedup.doc_blocks(df, k=2, id_col="doc_id").collect()
    )
    assert got == [(0, "a b"), (1, "c d"), (2, "e")]


def test_cross_doc_blocks_removed_and_text_reassembled(spark):
    df = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4"),   # blocks [w1 w2][w3 w4] — both shared
            (2, "w1 w2 x y"),     # shares block 0 with doc 1
            (3, "only unique here"),
            (4, "w3 w4 w1 w2"),   # same blocks as doc 1, swapped order
        ],
        ["doc_id", "text"],
    )
    got = _rows(dedup.remove_duplicated_segments(df, k=2, min_df=2))
    assert got[1] == ("", 2)
    assert got[2] == ("x y", 1)
    assert got[3] == ("only unique here", 0)
    assert got[4] == ("", 2)


def test_within_doc_repeat_does_not_count_as_duplicate(spark):
    # df counts DISTINCT documents: a block repeated inside one doc stays.
    df = spark.createDataFrame(
        [(1, "z z z z"), (2, "other words entirely kept")],
        ["doc_id", "text"],
    )
    got = _rows(dedup.remove_duplicated_segments(df, k=2, min_df=2))
    assert got[1] == ("z z z z", 0)
    assert got[2] == ("other words entirely kept", 0)


def test_min_df_threshold(spark):
    df = spark.createDataFrame(
        [(1, "c1 c2"), (2, "c1 c2"), (3, "c1 c2")],
        ["doc_id", "text"],
    )
    # min_df=4 > df=3 -> nothing removed
    got = _rows(dedup.remove_duplicated_segments(df, k=2, min_df=4))
    assert all(got[i] == ("c1 c2", 0) for i in (1, 2, 3))
    # min_df=3 == df -> removed everywhere
    got = _rows(dedup.remove_duplicated_segments(df, k=2, min_df=3))
    assert all(got[i] == ("", 1) for i in (1, 2, 3))
