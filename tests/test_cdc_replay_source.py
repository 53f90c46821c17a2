"""Custom Python DataSource (cdc_replay) tests: envelope schema, GTID-style
offsets, resume-from-offset (set_start_position parity), rate limiting."""

from __future__ import annotations

import json

from stream_cdc_spark.sources import cdc_replay
from stream_cdc_spark.tables import load, table_path
from tests.conftest import SF_SMALL


def _read_all(spark, tmp_path, name, **options):
    cdc_replay.register(spark)
    reader = spark.readStream.format("cdc_replay")
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.option("path", table_path(SF_SMALL, "events")).load()
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"{name}-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}")


def test_envelope_stream_complete(spark, tmp_path):
    out = _read_all(spark, tmp_path, "cdc_all")
    n_events = load(spark, SF_SMALL, "events").count()
    rows = out.collect()
    assert len(rows) == n_events
    r = {x.seq: x for x in rows}[0]
    # five-field envelope (mysql.py:416-426) + seq
    assert r.event_type in ("Insert", "Update", "Delete")
    assert r.gtid == f"{cdc_replay.SERVER_UUID}:0"
    assert r.database == "testdata" and r.table == "events"
    assert "after" in json.loads(r.content)


def test_resume_from_offset(spark, tmp_path):
    # set_start_position parity (mysql.py:453-460): start at seq 900
    out = _read_all(spark, tmp_path, "cdc_resume", startingSeq="900")
    seqs = [r.seq for r in out.collect()]
    assert min(seqs) == 900
    assert len(seqs) == load(spark, SF_SMALL, "events").count() - 900


def test_classification_distribution_matches(spark, tmp_path):
    out = _read_all(spark, tmp_path, "cdc_classify")
    got = {r.event_type: r.n for r in out.groupBy("event_type").count().withColumnRenamed("count", "n").collect()}
    ev = load(spark, SF_SMALL, "events")
    want = {"Insert": 0, "Update": 0, "Delete": 0}
    for r in ev.groupBy("event_type").count().collect():
        want[cdc_replay._OP_MAP[r.event_type]] += r["count"]
    assert got == want


def test_rate_limit_batches(spark, tmp_path):
    # batchEvents caps each micro-batch (BATCH_SIZE parity): 400 per
    # trigger over 1000 events needs >= 3 micro-batches to drain.
    # (Python stream readers don't support availableNow — observed fallback
    # to single-batch — so run a processing-time trigger and poll.)
    import time

    cdc_replay.register(spark)
    df = (
        spark.readStream.format("cdc_replay")
        .option("path", table_path(SF_SMALL, "events"))
        .option("batchEvents", "400")
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("cdc_rate")
        .option("checkpointLocation", str(tmp_path / "rate-ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT COUNT(*) c FROM cdc_rate").collect()[0].c >= 1000:
                break
            time.sleep(1)
        assert spark.sql("SELECT COUNT(*) c FROM cdc_rate").collect()[0].c == 1000
        batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
        assert len(batches) >= 3  # rate limit forced multiple micro-batches
        assert all(p["numInputRows"] <= 400 for p in batches)
    finally:
        q.stop()
