"""Unit tests for the training-data curation operators: deterministic
sampling, PII redaction, repetition quality, sequence packing."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from stream_cdc_spark.operators import packing, privacy, sampling, text
from stream_cdc_spark.tables import load
from tests.conftest import SF_SMALL


# --------------------------------------------------------------------- sampling


def test_hash_sample_stable_under_repartition(spark):
    d = load(spark, SF_SMALL, "documents")
    a = sorted(
        r.doc_id for r in sampling.hash_sample(d, "doc_id", 1024).collect()
    )
    b = sorted(
        r.doc_id
        for r in sampling.hash_sample(d.repartition(17), "doc_id", 1024).collect()
    )
    assert a == b and len(a) > 0


def test_hash_sample_rate_roughly_holds(spark):
    d = load(spark, SF_SMALL, "documents")
    n = d.count()
    kept = sampling.hash_sample(d, "doc_id", 2048).count()  # rate 1/2
    assert 0.35 * n < kept < 0.65 * n


def test_stratified_sample_drops_unlisted_strata(spark):
    d = load(spark, SF_SMALL, "documents")
    kept = sampling.stratified_sample(
        d, "lang", {"en": 4096}, key="doc_id"
    )
    langs = {r.lang for r in kept.select("lang").distinct().collect()}
    assert langs == {"en"}
    # rate 4096/4096 keeps every row of the listed stratum
    assert kept.count() == d.filter(F.col("lang") == "en").count()


def test_sample_is_subset_and_seed_sensitive(spark):
    d = load(spark, SF_SMALL, "documents")
    s1 = {r.doc_id for r in sampling.hash_sample(d, "doc_id", 1024, "a").collect()}
    s2 = {r.doc_id for r in sampling.hash_sample(d, "doc_id", 1024, "b").collect()}
    allids = {r.doc_id for r in d.select("doc_id").collect()}
    assert s1 <= allids and s2 <= allids
    assert s1 != s2  # different seeds select different sets


def test_mixture_rates_targets_mixture(spark):
    d = load(spark, SF_SMALL, "documents")
    rates = sampling.mixture_rates(
        d, "lang", {"en": 0.5, "de": 0.5}, total_rate_4096=2048
    )
    assert set(rates) == {"en", "de"}
    assert all(0 <= r <= sampling.RATE_DENOM for r in rates.values())
    # 'de' is the smaller stratum but must contribute equal volume -> its
    # rate must exceed 'en's.
    assert rates["de"] > rates["en"]
    # Expected kept volumes should be roughly equal (within hash noise).
    counts = dict(d.groupBy("lang").count().collect())
    vol = {s: counts[s] * rates[s] / sampling.RATE_DENOM for s in rates}
    assert abs(vol["en"] - vol["de"]) / max(vol.values()) < 0.2


def test_hash_cutoff_bounds():
    assert sampling.hash_cutoff(0) == "000"
    assert sampling.hash_cutoff(4096) == "g"  # full rate: above every hex prefix
    with pytest.raises(ValueError):
        sampling.hash_cutoff(4097)


# --------------------------------------------------------------------- privacy


def test_redact_patterns(spark):
    rows = [
        ("mail me at bob.smith+x@example.co.uk now",),
        ("call +44 (0)20 7946 0958 today",),
        ("id 123456789 ok",),
        ("clean text",),
    ]
    df = spark.createDataFrame(rows, "s string")
    out = [r.r for r in df.select(privacy.redact(F.col("s")).alias("r")).collect()]
    assert out[0] == "mail me at [EMAIL] now"
    assert out[1] == "call [PHONE] today"
    assert out[2] == "id [NUM] ok"
    assert out[3] == "clean text"


def test_redact_email_wins_over_digit_run(spark):
    df = spark.createDataFrame([("a123456@example.com",)], "s string")
    out = df.select(privacy.redact(F.col("s")).alias("r")).collect()[0].r
    assert out == "[EMAIL]"  # email rule fires before the digit-run rule


def test_redaction_report_counts(spark):
    df = spark.createDataFrame(
        [("t", "x 12345 y 678"), ("t", "no digits"), ("u", "a@b.io")],
        "g string, s string",
    )
    rows = {r.g: r for r in privacy.redaction_report(df, "s", "g").collect()}
    assert rows["t"].n_digit_run == 2 and rows["t"].n_rows_touched == 1
    assert rows["u"].n_email == 1 and rows["u"].n_rows == 1


# ------------------------------------------------------------------ repetition


def test_repetition_features_known_doc(spark):
    df = spark.createDataFrame([(1, "a b a b a")], "doc_id long, text string")
    r = text.repetition_features(df).collect()[0]
    assert r.n_words == 5 and r.n_distinct_words == 2
    assert r.dup_word_permille == 600  # floor(1000*3/5)
    assert r.top_word_permille == 600  # 'a' x3
    assert r.top_bigram_permille == 500  # 'a b' twice of 4 bigrams


def test_repetition_single_word_doc(spark):
    df = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    r = text.repetition_features(df).collect()[0]
    assert r.n_words == 1 and r.dup_word_permille == 0
    assert r.top_bigram_permille == 0  # no bigrams -> 0, not NULL/error


# --------------------------------------------------------------------- packing


def test_greedy_fill_edges():
    # exact fit keeps filling; overflow starts a new sequence
    assert packing.greedy_fill([256, 256, 1], 512) == [0, 0, 1]
    # oversize doc gets its own sequence, later docs move on
    assert packing.greedy_fill([600, 10, 10], 512) == [0, 1, 1]
    assert packing.greedy_fill([10, 600, 10], 512) == [0, 1, 2]
    assert packing.greedy_fill([], 512) == []


def test_pack_sequences_invariants(spark):
    d = load(spark, SF_SMALL, "documents").select(
        "doc_id", text.token_count(F.col("text")).alias("tokens")
    )
    packed = packing.pack_sequences(d, "tokens", budget=512, n_shards=8)
    rows = packed.collect()
    assert {r.doc_id for r in rows} == {
        r.doc_id for r in d.select("doc_id").collect()
    }
    stats = packing.sequence_stats(packed, "tokens").collect()
    for s in stats:
        assert s.total_tokens <= 512 or s.n_docs == 1
    # deterministic: re-running yields identical assignment
    again = packing.pack_sequences(
        d.repartition(13), "tokens", budget=512, n_shards=8
    ).collect()
    assert sorted((r.doc_id, r.shard, r.seq_no) for r in rows) == sorted(
        (r.doc_id, r.shard, r.seq_no) for r in again
    )


def test_pack_sequences_respects_doc_order(spark):
    df = spark.createDataFrame(
        [(0, 300), (8, 200), (16, 300)], "doc_id long, tokens long"
    )
    packed = {
        r.doc_id: r.seq_no
        for r in packing.pack_sequences(df, "tokens", 512, n_shards=8).collect()
    }
    # all three land in shard 0: 300+200 fills seq 0, the next overflows
    assert packed == {0: 0, 8: 0, 16: 1}


# --------------------------------------------------------------- decontamination


def test_contamination_flags_planted_overlap(spark):
    from stream_cdc_spark.operators import dedup

    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over dogs")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (10, "prefix words the quick brown fox tail"),  # shares a 4-gram
            (11, "completely different content entirely here now"),
            (12, "quick brown fox jumps somewhere else"),  # shares a 4-gram
        ],
        "doc_id long, text string",
    )
    got = {
        r.id: r.n_hit_shingles
        for r in dedup.contamination_flags(corpus, bench, k=4).collect()
    }
    assert set(got) == {10, 12}
    assert got[10] == 1 and got[12] == 1


def test_contamination_flags_benchmark_broadcasts(spark):
    from stream_cdc_spark.operators import dedup
    from stream_cdc_spark.tables import load
    from tests.conftest import SF_SMALL

    d = load(spark, SF_SMALL, "documents")
    out = dedup.contamination_flags(
        d.filter(F.col("doc_id") % 97 != 0), d.filter(F.col("doc_id") % 97 == 0)
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan


def test_curation_decisions_planted_flags(spark):
    from stream_cdc_spark.operators.curation import apply_curation, curation_decisions

    good = "the cat sat on the mat and the dog ran to the park in the sun again today"
    docs = spark.createDataFrame(
        [
            (1, good, "en"),
            (2, good, "en"),          # exact dup of 1 -> dropped, 1 kept
            (3, good + " extra", "fr"),  # lang filtered
            (4, "word word word word word word word word word word", "en"),  # repetitive + low quality (no stopwords... has none)
        ],
        "doc_id bigint, text string, lang string",
    )
    bench = spark.createDataFrame(
        [(99, "dog ran to the park today yes", "en")],
        "doc_id bigint, text string, lang string",
    )
    got = {
        r.doc_id: (r.keep, r.reasons)
        for r in curation_decisions(
            docs, eval_set=bench, contamination_k=4
        ).collect()
    }
    assert got[2] == (False, "exact_dup,contamination")  # shares 'dog ran to the'
    assert got[1] == (False, "contamination")
    assert got[3][0] is False and "lang" in got[3][1]
    assert got[4][0] is False and "repetition" in got[4][1]

    kept = apply_curation(docs, curation_decisions(docs, eval_set=None))
    # without the eval set, doc 1 (canonical) survives every other filter
    assert {r.doc_id for r in kept.collect()} == {1}
