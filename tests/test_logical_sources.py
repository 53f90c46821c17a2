"""PostgreSQL wal2json + MongoDB change-stream sources (registry entries
`postgres-wal2json` / `mongo-changestream`).

The reference anticipates both datasources without implementing them
(stream_cdc/datasources/base.py:10-11); these tests pin the engine's
implementations to the PUBLIC wire formats (wal2json format-version=2;
MongoDB change-stream event documents) and to the engine's own envelope
contract: streaming ingest == batch parse, transaction markers and
non-row events drop, offsets (lsn / resume token) ride along.
"""

from __future__ import annotations

import json

from stream_cdc_spark.sources import datasource_registry
from stream_cdc_spark.sources.mongo import parse_change_stream_batch
from stream_cdc_spark.sources.postgres import parse_wal2json_batch

WAL2JSON_LINES = [
    # txn markers must drop (B/C), as must TRUNCATE
    {"action": "B", "lsn": "0/16B2C50"},
    {
        "action": "I",
        "schema": "public",
        "table": "orders",
        "lsn": "0/16B2C60",
        "columns": [
            {"name": "id", "type": "integer", "value": 1},
            {"name": "amount", "type": "numeric", "value": 12.5},
            {"name": "note", "type": "text", "value": "first"},
        ],
    },
    {
        "action": "U",
        "schema": "public",
        "table": "orders",
        "lsn": "0/16B2C70",
        "columns": [
            {"name": "id", "type": "integer", "value": 1},
            {"name": "amount", "type": "numeric", "value": 20},
        ],
        "identity": [{"name": "id", "type": "integer", "value": 1}],
    },
    {
        "action": "D",
        "schema": "public",
        "table": "orders",
        "lsn": "0/16B2C80",
        "identity": [{"name": "id", "type": "integer", "value": 1}],
    },
    {"action": "T", "schema": "public", "table": "orders", "lsn": "0/16B2C90"},
    {"action": "C", "lsn": "0/16B2CA0"},
]

CHANGE_STREAM_LINES = [
    {
        "_id": {"_data": "8263A"},
        "operationType": "insert",
        "ns": {"db": "shop", "coll": "orders"},
        "documentKey": {"_id": "o1"},
        "fullDocument": {"_id": "o1", "amount": 12.5, "note": "first"},
    },
    {
        "_id": {"_data": "8263B"},
        "operationType": "update",
        "ns": {"db": "shop", "coll": "orders"},
        "documentKey": {"_id": "o1"},
        "fullDocument": {"_id": "o1", "amount": 20},
    },
    {
        "_id": {"_data": "8263C"},
        "operationType": "replace",
        "ns": {"db": "shop", "coll": "orders"},
        "documentKey": {"_id": "o1"},
        "fullDocument": {"_id": "o1", "amount": 21},
    },
    {
        "_id": {"_data": "8263D"},
        "operationType": "delete",
        "ns": {"db": "shop", "coll": "orders"},
        "documentKey": {"_id": "o1"},
    },
    # non-row stream events drop
    {"_id": {"_data": "8263E"}, "operationType": "invalidate"},
]


def _write_lines(tmp_path, name, lines):
    d = tmp_path / name
    d.mkdir()
    (d / "part-0.jsonl").write_text("\n".join(json.dumps(x) for x in lines) + "\n")
    return str(d)


def _raw(spark, lines):
    return spark.createDataFrame([(json.dumps(x),) for x in lines], "value string")


class TestWal2Json:
    def test_batch_parse_envelope(self, spark):
        rows = {
            r["gtid"]: r
            for r in parse_wal2json_batch(_raw(spark, WAL2JSON_LINES)).collect()
        }
        # B/C/T dropped: 3 row changes survive
        assert len(rows) == 3
        ins = rows["0/16B2C60"]
        assert ins["event_type"] == "Insert"
        assert (ins["database"], ins["table"]) == ("public", "orders")
        # stringify-everything: numbers arrive as their JSON text
        assert ins["content"]["after"] == {
            "id": "1",
            "amount": "12.5",
            "note": "first",
        }
        assert ins["content"]["before"] is None
        upd = rows["0/16B2C70"]
        assert upd["event_type"] == "Update"
        assert upd["content"]["before"] == {"id": "1"}  # REPLICA IDENTITY
        assert upd["content"]["after"]["amount"] == "20"
        dele = rows["0/16B2C80"]
        assert dele["event_type"] == "Delete"
        assert dele["content"]["after"] is None
        assert dele["content"]["before"] == {"id": "1"}
        assert dele["lsn"] == "0/16B2C80"  # transport column for O4

    def test_stream_equals_batch(self, spark, tmp_path):
        spool = _write_lines(tmp_path, "wal", WAL2JSON_LINES)
        stream = datasource_registry.create(
            "postgres-wal2json", spark=spark, mock_path=spool
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("wal_out")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = {
            tuple(r)
            for r in spark.table("wal_out")
            .select("event_type", "gtid", "database", "table", "lsn")
            .collect()
        }
        batch = {
            tuple(r)
            for r in parse_wal2json_batch(_raw(spark, WAL2JSON_LINES))
            .select("event_type", "gtid", "database", "table", "lsn")
            .collect()
        }
        assert streamed == batch and len(streamed) == 3


class TestMongoChangeStream:
    def test_batch_parse_envelope(self, spark):
        rows = {
            r["gtid"]: r
            for r in parse_change_stream_batch(
                _raw(spark, CHANGE_STREAM_LINES)
            ).collect()
        }
        assert len(rows) == 4  # invalidate dropped
        assert rows["8263A"]["event_type"] == "Insert"
        assert rows["8263A"]["content"]["after"]["amount"] == "12.5"
        assert rows["8263B"]["event_type"] == "Update"
        assert rows["8263C"]["event_type"] == "Update"  # replace ≡ Update
        d = rows["8263D"]
        assert d["event_type"] == "Delete"
        assert d["content"]["after"] is None
        assert d["content"]["before"] == {"_id": "o1"}  # documentKey identity
        assert (d["database"], d["table"]) == ("shop", "orders")
        assert d["resume_token"] == "8263D"

    def test_stream_equals_batch(self, spark, tmp_path):
        spool = _write_lines(tmp_path, "cs", CHANGE_STREAM_LINES)
        stream = datasource_registry.create(
            "mongo-changestream", spark=spark, mock_path=spool
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("cs_out")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert spark.table("cs_out").count() == 4


def test_registry_lists_logical_sources():
    names = datasource_registry.names()
    assert "postgres-wal2json" in names
    assert "mongo-changestream" in names


def test_missing_path_fails_fast(spark):
    import pytest

    from stream_cdc_spark.sources.mongo import change_stream
    from stream_cdc_spark.sources.postgres import wal2json_stream

    with pytest.raises(ValueError, match="required"):
        wal2json_stream(spark)
    with pytest.raises(ValueError, match="required"):
        change_stream(spark)
