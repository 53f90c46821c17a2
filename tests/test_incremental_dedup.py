"""Incremental batch-vs-indexed-corpus dedup and containment pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_cdc_spark.operators import dedup
import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


BODY = "the quick brown fox jumps over the lazy dog near the riverbank today"
OTHER = "completely different words about astronomy telescopes and galaxies far away"


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_sequential_admission_matches_greedy_reference(spark):
    """The full production loop — admit batch, keep survivors, extend the
    corpus+index, repeat — must equal a chained-greedy reference run over
    the real corpus: a doc is dropped iff a KEPT doc from an earlier
    batch matches it, or ANY smaller-id doc in its own batch does
    (the within-batch min-id rule stays non-chained, as q39)."""
    from pyspark.sql import functions as F

    from stream_cdc_spark.tables import load
    from tests.conftest import SF_SMALL

    d = load(spark, SF_SMALL, "documents").select("doc_id", "text")
    batches = [d.filter(F.col("doc_id") % 3 == i) for i in range(3)]

    corpus = None
    index = None
    spark_kept: set[int] = set()
    for b in batches:
        if corpus is None:
            # bootstrap: empty corpus/index with the right schemas
            corpus = d.limit(0)
            index = dedup.minhash_band_index(d.limit(0))
        out = dedup.incremental_verified_dedup(b, corpus, index=index)
        kept_ids = {r["doc_id"] for r in out.filter("keep").collect()}
        spark_kept |= kept_ids
        admitted = b.join(
            spark.createDataFrame([(i,) for i in kept_ids] or [(-1,)], "doc_id bigint"),
            "doc_id",
            "left_semi",
        )
        corpus = corpus.unionByName(admitted)
        index = dedup.update_band_index(index, admitted)

    # chained-greedy reference with exact shingle Jaccard
    rows = d.collect()
    sh = {}
    for r in rows:
        toks = r["text"].split(" ")
        sh[r["doc_id"]] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    def jac(a, b):
        sa, sb = sh[a], sh[b]
        if not sa or not sb:
            return 0.0
        inter = len(sa & sb)
        return inter / (len(sa) + len(sb) - inter)

    ref_kept: set[int] = set()
    for i in range(3):
        batch_ids = sorted(r["doc_id"] for r in rows if r["doc_id"] % 3 == i)
        for did in batch_ids:
            dup = any(jac(did, o) >= 0.8 for o in ref_kept if o % 3 != i or o < did)
            dup = dup or any(
                jac(did, o) >= 0.8 for o in batch_ids if o < did
            )
            if not dup:
                ref_kept.add(did)

    assert spark_kept == ref_kept
    assert len(spark_kept) < d.count()  # dups genuinely dropped


def test_incremental_rejects_mismatched_index_params(spark, tmp_path):
    """A prebuilt index built with different (k, num_hashes, bands) yields
    zero corpus candidates — every near-dup would be silently admitted.
    The index is stamped with its parameters; a mismatched probe raises."""
    import pytest

    corpus = _docs(spark, [(1, BODY), (2, OTHER)])
    batch = _docs(spark, [(10, BODY)])
    idx = dedup.minhash_band_index(corpus, bands=8, num_hashes=32)
    with pytest.raises(ValueError, match="parameter mismatch"):
        dedup.incremental_verified_dedup(batch, corpus, index=idx)
    # matching params still accepted (and the stamp survives parquet)
    path = str(tmp_path / "lsh-index-stamp-test")
    dedup.minhash_band_index(corpus).write.mode("overwrite").parquet(path)
    reloaded = spark.read.parquet(path)
    out = dedup.incremental_verified_dedup(batch, corpus, index=reloaded)
    assert {r["doc_id"]: r["keep"] for r in out.collect()} == {10: False}


def test_incremental_rejects_mismatched_signature_scheme(spark, tmp_path):
    """Scheme drift is worse than parameter drift: identical (k, hashes,
    bands) under a different hash scheme shares zero band keys, so a probe
    would silently admit every near-dup. An index stamped with a foreign
    lsh_scheme must refuse with migration guidance; a stamp WITHOUT the
    scheme key (pre-versioning index) stays accepted for back-compat."""
    import pytest

    corpus = _docs(spark, [(1, BODY), (2, OTHER)])
    batch = _docs(spark, [(10, BODY)])

    idx = dedup.minhash_band_index(corpus)
    assert dict(idx.schema["band"].metadata)["lsh_scheme"] == dedup.LSH_SCHEME

    foreign = dict(idx.schema["band"].metadata)
    foreign["lsh_scheme"] = "minhash-murmur3-seeded/bandkey-crc32/v9"
    drifted = idx.withMetadata("band", foreign)
    with pytest.raises(ValueError, match="scheme mismatch.*rebuilding"):
        dedup.incremental_verified_dedup(batch, corpus, index=drifted)

    # pre-versioning stamp: parameters only, no scheme key — accepted
    legacy_stamp = {"lsh_k": 3, "lsh_num_hashes": 64, "lsh_bands": 16}
    legacy = idx.withMetadata("band", legacy_stamp)
    out = dedup.incremental_verified_dedup(batch, corpus, index=legacy)
    assert {r["doc_id"]: r["keep"] for r in out.collect()} == {10: False}

    # the scheme id survives a parquet round-trip next to the parameters
    path = str(tmp_path / "lsh-index-scheme-stamp-test")
    idx.write.mode("overwrite").parquet(path)
    got = dict(spark.read.parquet(path).schema["band"].metadata)
    assert got["lsh_scheme"] == dedup.LSH_SCHEME


def test_containment_denominators_ignore_df_cap(spark, monkeypatch):
    """The df-cap must apply only to the pair-generating self-join, never
    the per-doc size denominators: capping |A| for a boilerplate-heavy doc
    shrinks the denominator toward the doc's few informative shingles and
    manufactures a false positive when those happen to be shared. Simulate
    a fired cap by forcing the filter to drop the boilerplate shingles and
    assert the short doc is NOT reported contained (old capped-denominator
    behavior reported exactly 1_000_000 ppm here)."""
    boiler = " ".join(f"zz{i}" for i in range(12))
    tail = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i} x{i}" for i in range(30))
    # doc 1: mostly boilerplate, tiny informative tail shared with doc 2
    df = _docs(spark, [(1, boiler + " " + tail), (2, tail + " " + filler)])

    def drop_boiler(sh, max_df, **kw):
        return sh.filter(~F.col("shingle").rlike("zz"))

    monkeypatch.setattr(dedup, "stop_shingle_filter", drop_boiler)
    all_ratios = {
        (r["id_in"], r["id_out"]): r["containment_ppm"]
        for r in dedup.containment_pairs(df, threshold_ppm=1).collect()
    }
    # true containment of doc 1 in doc 2 is 3 shared / 14 total shingles;
    # capped denominators would report 3/3 = 1.0
    assert all_ratios[(1, 2)] < 300_000, all_ratios
    # so at the default 0.9 threshold the pair must not be emitted
    assert dedup.containment_pairs(df).count() == 0


def test_fuzzy_prefix_pairs_catches_typos_and_guards_hot_blocks(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    typo = "alpha beta gamma delta epsilon zeta eta theta iota kappo"  # 1 edit
    df = _docs(
        spark,
        [(1, base), (2, typo), (3, "alpha totally different body of words here")]
        # a hot block: >3 docs sharing first token 'hot'
        + [(10 + i, f"hot filler number {i} with words") for i in range(5)],
    )
    out = {
        (r["id_a"], r["id_b"]): r["edit_distance"]
        for r in dedup.fuzzy_prefix_pairs(df, max_distance=5, max_block=3).collect()
    }
    assert out.get((1, 2)) == 1          # the typo pair, exact distance
    assert (1, 3) not in out             # same block, distance above band
    assert not any(a >= 10 for a, _ in out)  # hot block excluded entirely
