"""Kafka transport plumbing — everything testable without a broker:
option maps, payload codecs (on batch DataFrames), and round-trip
command encode→decode fidelity."""

import json

from pyspark.sql import functions as F

from hyper_storage_spark.streaming.kafka import (
    decode_command_payload,
    encode_feed_payload,
    kafka_sink_options,
    kafka_source_options,
)


def test_source_options_shape():
    opts = kafka_source_options("k1:9092,k2:9092", "hs-commands")
    assert opts == {
        "kafka.bootstrap.servers": "k1:9092,k2:9092",
        "subscribe": "hs-commands",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
    }
    opts = kafka_source_options(
        "k:9092", "t", starting_offsets="latest", fail_on_data_loss=True,
        extra={"maxOffsetsPerTrigger": "10000"},
    )
    assert opts["startingOffsets"] == "latest"
    assert opts["failOnDataLoss"] == "true"
    assert opts["maxOffsetsPerTrigger"] == "10000"


def test_sink_options_shape():
    opts = kafka_sink_options("k:9092", "hs-feed", extra={"kafka.acks": "all"})
    assert opts["kafka.bootstrap.servers"] == "k:9092"
    assert opts["topic"] == "hs-feed"
    assert opts["kafka.acks"] == "all"


def test_decode_command_payload(spark):
    records = [
        (json.dumps({"seq": 1, "method": "put", "path": "a~/x", "body": "{\"v\":1}"}).encode(),),
        (json.dumps({"seq": 2, "method": "delete", "path": "a~/x", "body": None}).encode(),),
    ]
    raw = spark.createDataFrame(records, "value binary")
    rows = decode_command_payload(raw).orderBy("seq").collect()
    assert [(r.seq, r.method, r.path, r.body) for r in rows] == [
        (1, "put", "a~/x", '{"v":1}'),
        (2, "delete", "a~/x", None),
    ]


def test_encode_feed_payload_keys_by_document(spark):
    feed = spark.createDataFrame(
        [
            ("u1", "doc~", "i1", 1, "feed:put", "{}", 1000),
            ("u2", "doc~", "i1", 2, "feed:patch", "{}", 1001),
        ],
        "uuid string, document_uri string, item_id string, revision long, "
        "method string, body string, ts long",
    )
    out = encode_feed_payload(feed).collect()
    assert all(r.key == "doc~" for r in out)
    v = json.loads(out[0].value)
    assert v["revision"] == 1 and v["method"] == "feed:put"


def test_feed_events_roundtrip_through_kafka_payload(spark):
    """encode(feed) -> kafka record value -> parse = original event
    (what a consumer sees must reconstruct the event exactly)."""
    ev = {
        "uuid": "abc123",
        "document_uri": "col~",
        "item_id": "i9",
        "revision": 7,
        "method": "feed:delete",
        "body": None,
        "ts": 1234567,
    }
    feed = spark.createDataFrame([tuple(ev.values())], ", ".join(
        [
            "uuid string", "document_uri string", "item_id string",
            "revision long", "method string", "body string", "ts long",
        ]
    ))
    rec = encode_feed_payload(feed).first()
    assert json.loads(rec.value) == {k: v for k, v in ev.items() if v is not None}


def test_kafka_builders_exist_and_are_wired():
    """The format('kafka') wiring exists with the documented signature
    (executable only with the connector JAR — asserted structurally)."""
    from hyper_storage_spark.streaming import feed_kafka_sink, kafka_command_stream

    assert callable(kafka_command_stream) and callable(feed_kafka_sink)
    import inspect

    sig = inspect.signature(kafka_command_stream)
    assert list(sig.parameters)[:3] == ["spark", "bootstrap_servers", "topic"]


def test_undecodable_payload_becomes_dead_letterable_row(spark):
    """A non-JSON Kafka message must decode to a row the ingest
    dispatcher can dead-letter (method='__undecodable__', raw text in
    body) — an all-null row would crash the path router and poison the
    retried batch."""
    from hyper_storage_spark.streaming.kafka import decode_command_payload

    raw = spark.createDataFrame(
        [(b'{"seq": 1, "method": "put", "path": "d", "body": "{}"}',), (b"not json",)],
        "value binary",
    )
    rows = {r.method: r for r in decode_command_payload(raw).collect()}
    assert rows["put"].path == "d" and rows["put"].seq == 1
    bad = rows["__undecodable__"]
    assert bad.path == "" and bad.body == "not json"


def test_index_ddl_events_ride_the_kafka_envelope(spark, tmp_path):
    """Index-lifecycle CDC (feed:indexpost/feed:indexdelete) flows
    through the same Kafka payload codec as content events: keyed by
    the collection uri (per-document partition ordering holds for DDL
    too), value = the full feed envelope with the definition body."""
    import json

    from hyper_storage_spark.store import DocumentStore
    from hyper_storage_spark.streaming.kafka import encode_feed_payload

    store = DocumentStore(str(tmp_path / "ddl_kafka"), spark=spark)
    store.put("k~/i1", {"b": "x"})
    store.create_index("k~", "by_b", [], filter_by=None)
    store.delete_index("k~", "by_b")

    feed = spark.createDataFrame(
        store.feed_events(),
        "uuid string, document_uri string, item_id string, revision long, "
        "method string, body string, ts long",
    )
    recs = encode_feed_payload(feed).collect()
    ddl = [r for r in recs if json.loads(r.value)["method"].startswith("feed:index")]
    assert len(ddl) == 2
    for rec in ddl:
        assert rec.key == "k~"  # same partition as the collection's content events
        env = json.loads(rec.value)
        assert env["item_id"] == "by_b" and env["revision"] == 0
        assert json.loads(env["body"])["indexId"] == "by_b"
    assert {json.loads(r.value)["method"] for r in ddl} == {
        "feed:indexpost", "feed:indexdelete"
    }
