"""Continuous curation e2e: restart-safe, idempotent, equal to the
batch-sequential reference."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stream_cdc_spark.streaming.curation import CurationPipeline
from stream_cdc_spark.tables import load
from tests.conftest import SF_SMALL

MIN_TOKENS = 5
THRESH = 0.8


def _greedy_reference(rows, slices):
    """Chained-greedy across micro-batches, non-chained min-id within one
    (the q110/q39 hybrid), after the same quality gate."""
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

    tok_ok = {
        r["doc_id"] for r in rows if len(r["text"].split(" ")) >= MIN_TOKENS
    }
    kept: set[int] = set()
    for batch_ids in slices:
        ok = sorted(i for i in batch_ids if i in tok_ok)
        for did in ok:
            dup = any(jac(did, o) >= THRESH for o in kept)
            dup = dup or any(
                jac(did, o) >= THRESH for o in ok if o < did
            )
            if not dup:
                kept.add(did)
    return kept


@pytest.mark.slow
def test_curation_stream_restart_matches_reference(spark, tmp_path):
    d = load(spark, SF_SMALL, "documents").select("doc_id", "text")
    rows = d.collect()
    indir = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(indir, exist_ok=True)

    # four deterministic slices, written as separate files so
    # maxFilesPerTrigger=1 makes each one its own micro-batch
    slices = [
        sorted(r["doc_id"] for r in rows if r["doc_id"] % 4 == i)
        for i in range(4)
    ]
    for i, ids in enumerate(slices):
        sdf = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in rows if r["doc_id"] in set(ids)],
            "doc_id bigint, text string",
        )
        sdf.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(indir, f"slice={i}")
        )

    pipe = CurationPipeline(state, min_tokens=MIN_TOKENS)

    def run(n_slices):
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(indir + "/slice={" + ",".join(map(str, range(n_slices))) + "}")
        )
        q = (
            stream.writeStream.foreachBatch(pipe.sink())
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run(2)   # phase 1: two slices
    run(4)   # phase 2: restart from checkpoint, two more

    kept = {r["doc_id"] for r in pipe.corpus(spark).collect()}
    want = _greedy_reference(rows, slices)
    assert kept == want
    assert 0 < len(kept) < len(rows)

    # decisions: exactly one row per doc, reasons consistent
    dec = pipe.decisions(spark)
    assert dec.count() == len(rows)
    assert dec.select("doc_id").distinct().count() == len(rows)
    by_reason = {
        r["reason"]: r["n"]
        for r in dec.groupBy("reason").agg(F.count("*").alias("n")).collect()
    }
    assert by_reason.get(None, 0) == len(want)  # kept rows carry no reason
    assert set(by_reason) <= {None, "quality", "near_dup"}


def test_curation_replayed_batch_is_idempotent(spark, tmp_path):
    """Re-running foreach_batch for an already-committed batch id must see
    exactly the pre-batch state and rewrite identical outputs."""
    state = str(tmp_path / "state")
    pipe = CurationPipeline(state, min_tokens=2)
    b0 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "one two three four five")],
        "doc_id bigint, text string",
    )
    b1 = spark.createDataFrame(
        [(3, "alpha beta gamma delta epsilon"), (4, "short")],
        "doc_id bigint, text string",
    )
    pipe.foreach_batch(b0, 0)
    pipe.foreach_batch(b1, 1)
    first = sorted(map(tuple, pipe.decisions(spark).collect()))
    kept_first = sorted(r["doc_id"] for r in pipe.corpus(spark).collect())
    pipe.foreach_batch(b1, 1)  # replay
    assert sorted(map(tuple, pipe.decisions(spark).collect())) == first
    assert sorted(r["doc_id"] for r in pipe.corpus(spark).collect()) == kept_first
    # and the semantics: 3 dropped as near-dup of 1, 4 dropped on quality
    dec = {r["doc_id"]: (r["keep"], r["reason"], r["dup_of"]) for r in pipe.decisions(spark).collect()}
    assert dec[3] == (False, "near_dup", 1)
    assert dec[4] == (False, "quality", None)
    assert dec[1][0] and dec[2][0]


def test_curation_cli_mode_drains_corpus(spark, tmp_path, monkeypatch):
    """PIPELINE=curation entrypoint: one availableNow drain over the
    sf0.001 corpus produces a decision per doc and a non-trivial kept
    corpus (the CLI twin of the restart e2e)."""
    from stream_cdc_spark import main as M

    state = str(tmp_path / "cli-state")
    monkeypatch.setenv("PIPELINE", "curation")
    monkeypatch.setenv("DRAIN_AND_EXIT", "1")
    monkeypatch.setenv("DOCS_PATH", "/root/testdata/sf0.001")
    monkeypatch.setenv("CURATION_STATE_DIR", state)
    monkeypatch.setenv("CHECKPOINT_DIR", str(tmp_path / "cli-ckpt"))
    assert M.main() == 0
    pipe = CurationPipeline(state)
    n_docs = load(spark, SF_SMALL, "documents").count()
    assert pipe.decisions(spark).count() == n_docs
    kept = pipe.corpus(spark).count()
    assert 0 < kept < n_docs


def test_curation_crash_between_state_writes_recovers(spark, tmp_path):
    """Crash-consistency of the batch-versioned protocol: if the batch
    dies AFTER writing decisions but BEFORE the kept/index writes, the
    replay must still converge to exactly the clean-run state (its reads
    exclude the dead batch's partial output)."""
    import stream_cdc_spark.operators.dedup as D

    state = str(tmp_path / "state")
    pipe = CurationPipeline(state, min_tokens=2)
    b0 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "one two three four five")],
        "doc_id bigint, text string",
    )
    b1 = spark.createDataFrame(
        [(3, "alpha beta gamma delta epsilon"), (4, "zz yy xx ww vv")],
        "doc_id bigint, text string",
    )
    pipe.foreach_batch(b0, 0)

    import stream_cdc_spark.streaming.curation as C

    # simulate the torn batch: perform batch 1's work manually, writing
    # ONLY the decisions subdir before "crashing" (kept/index never land)
    docs = b1.select("doc_id", "text")
    from pyspark.sql import functions as F

    qual_ok = docs.filter(pipe.quality_predicate)
    corpus = pipe._read(spark, pipe.kept_dir, C.KEPT_SCHEMA, 1)
    index = pipe._read(spark, pipe.index_dir, C.INDEX_SCHEMA, 1)
    adm = D.incremental_verified_dedup(qual_ok, corpus, index=index)
    import os

    sub = "batch=000000001"
    # decisions land; kept/index do NOT (the torn write)
    adm.select(
        "doc_id", "keep", F.lit(None).cast("string").alias("reason"),
        "dup_of",
    ).write.mode("overwrite").parquet(os.path.join(pipe.decisions_dir, sub))

    # replay of batch 1 (what the checkpoint would do) must fully recover
    pipe.foreach_batch(b1, 1)
    dec = {
        r["doc_id"]: (r["keep"], r["dup_of"])
        for r in pipe.decisions(spark).collect()
    }
    assert dec[3] == (False, 1)
    assert dec[4] == (True, None)
    kept = sorted(r["doc_id"] for r in pipe.corpus(spark).collect())
    assert kept == [1, 2, 4]
    # and batch 2 sees a consistent world
    b2 = spark.createDataFrame(
        [(5, "zz yy xx ww vv")], "doc_id bigint, text string"
    )
    pipe.foreach_batch(b2, 2)
    dec5 = {
        r["doc_id"]: (r["keep"], r["dup_of"])
        for r in pipe.decisions(spark).collect()
    }[5]
    assert dec5 == (False, 4)  # near-dups the batch-1 survivor via the index
