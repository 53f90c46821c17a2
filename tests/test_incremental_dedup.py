"""Incremental batch-vs-indexed-corpus dedup and containment pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_cdc_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


BODY = "the quick brown fox jumps over the lazy dog near the riverbank today"
OTHER = "completely different words about astronomy telescopes and galaxies far away"


def test_incremental_flags_corpus_and_batch_dups(spark):
    corpus = _docs(spark, [(1, BODY), (2, OTHER)])
    batch = _docs(
        spark,
        [
            (10, BODY),            # exact dup of corpus doc 1
            (11, "fresh unique content with nothing shared at all here ok"),
            (12, "fresh unique content with nothing shared at all here ok"),
            # ^ exact dup of batch doc 11 (smaller id wins)
        ],
    )
    out = {
        r["doc_id"]: (r["keep"], r["dup_of"])
        for r in dedup.incremental_verified_dedup(batch, corpus).collect()
    }
    assert out[10] == (False, 1)
    assert out[11] == (True, None)
    assert out[12] == (False, 11)


def test_incremental_prebuilt_index_matches_inline(spark):
    corpus = _docs(spark, [(1, BODY), (2, OTHER)])
    batch = _docs(spark, [(10, BODY), (11, OTHER + " plus a tail of words")])
    inline = sorted(
        map(tuple, dedup.incremental_verified_dedup(batch, corpus).collect())
    )
    idx = dedup.minhash_band_index(corpus)
    prebuilt = sorted(
        map(
            tuple,
            dedup.incremental_verified_dedup(batch, corpus, index=idx).collect(),
        )
    )
    assert inline == prebuilt


def test_incremental_index_probe_is_broadcast(spark):
    """With broadcast_batch the corpus index must be probed by a broadcast
    hash join (batch side built, index side streamed) — the corpus index
    never rides an exchange."""
    corpus = _docs(spark, [(1, BODY), (2, OTHER)])
    batch = _docs(spark, [(10, BODY)])
    plan = (
        dedup.incremental_verified_dedup(batch, corpus)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # the corpus text scan is pruned to candidate ids before shingling
    assert "LeftSemi" in plan


def test_containment_catches_engulfed_doc(spark):
    short = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"word{i} pad{i} fill{i}" for i in range(40))
    host = filler + " " + short
    df = _docs(spark, [(1, short), (2, host)])
    rows = {
        (r["id_in"], r["id_out"]): r["containment_ppm"]
        for r in dedup.containment_pairs(df).collect()
    }
    # every shingle of doc 1 appears in doc 2 -> containment 1.0 one way
    assert rows.get((1, 2)) == 1_000_000
    assert (2, 1) not in rows  # host is NOT contained in the fragment
    # and symmetric Jaccard is far below any dedup gate — the case
    # Jaccard-threshold dedup structurally misses
    sh1 = {" ".join(short.split()[i : i + 3]) for i in range(len(short.split()) - 2)}
    shh = {" ".join(host.split()[i : i + 3]) for i in range(len(host.split()) - 2)}
    j = len(sh1 & shh) / len(sh1 | shh)
    assert j < 0.2


def test_containment_emits_both_orientations_for_exact_dups(spark):
    df = _docs(spark, [(1, BODY), (2, BODY)])
    rows = {
        (r["id_in"], r["id_out"]): r["containment_ppm"]
        for r in dedup.containment_pairs(df).collect()
    }
    assert rows == {(1, 2): 1_000_000, (2, 1): 1_000_000}


def test_incremental_doc_below_shingle_size_is_kept(spark):
    corpus = _docs(spark, [(1, BODY)])
    batch = _docs(spark, [(10, "two words")])  # < k tokens, no shingles
    out = dedup.incremental_verified_dedup(batch, corpus).collect()
    assert [(r["doc_id"], r["keep"], r["dup_of"]) for r in out] == [
        (10, True, None)
    ]
