"""Loopback Kafka broker + wire codec + DataSources — SURVEY §2.1 #5.

The codec tests are pure-python (no Spark); the source tests drive the
broker through real worker processes via the session fixture.
"""

from __future__ import annotations

import struct

import pytest

from zmaxion_spark.sources import kafka_wire as W
from zmaxion_spark.sources.kafka_broker import KafkaWireClient, LoopbackKafkaBroker


# ---------------------------------------------------------------------------
# wire codec
# ---------------------------------------------------------------------------


def test_message_set_roundtrip_with_crc():
    msgs = [(b"k0", b"v0"), (None, b"v1"), (b"k2", None)]
    data = W.encode_message_set(7, msgs)
    out = W.decode_message_set(data)
    assert out == [(7, b"k0", b"v0"), (8, None, b"v1"), (9, b"k2", None)]


def test_message_set_detects_corruption():
    data = bytearray(W.encode_message_set(0, [(b"k", b"value")]))
    data[-1] ^= 0xFF  # flip one payload byte -> CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        W.decode_message_set(bytes(data))


def test_message_set_drops_partial_trailing_message():
    data = W.encode_message_set(0, [(b"a", b"b"), (b"c", b"d")])
    truncated = data[: len(data) - 3]
    out = W.decode_message_set(truncated)
    assert [o for o, _, _ in out] == [0]


def test_request_framing_layout():
    req = W.encode_request(W.API_FETCH, 0, 42, "cid", b"BODY")
    (size,) = struct.unpack(">i", req[:4])
    assert size == len(req) - 4
    c = W.Cursor(req[4:])
    assert c.i16() == W.API_FETCH
    assert c.i16() == 0
    assert c.i32() == 42
    assert c.string() == "cid"
    assert req.endswith(b"BODY")


# ---------------------------------------------------------------------------
# broker + client over a real socket
# ---------------------------------------------------------------------------


@pytest.fixture()
def broker():
    b = LoopbackKafkaBroker(n_partitions=2)
    yield b
    b.stop()


def test_produce_fetch_offsets_metadata(broker):
    with KafkaWireClient(broker.host, broker.port) as c:
        assert c.produce("t", 0, [(b"a", b"1"), (b"b", b"2")]) == 0
        assert c.produce("t", 0, [(None, b"3")]) == 2
        assert c.metadata(["t"]) == {"t": [0, 1]}
        assert c.list_offsets("t", 0) == 3
        assert c.list_offsets("t", 0, -2) == 0
        hw, msgs = c.fetch("t", 0, 1)
        assert hw == 3
        assert msgs == [(1, b"b", b"2"), (2, None, b"3")]
        # out-of-range fetch: empty, not an error payload
        hw, msgs = c.fetch("t", 0, 99)
        assert (hw, msgs) == (3, [])


def test_fetch_respects_max_bytes_but_serves_one(broker):
    with KafkaWireClient(broker.host, broker.port) as c:
        c.produce("t", 0, [(b"k", b"x" * 100)] * 5)
        _hw, msgs = c.fetch("t", 0, 0, max_bytes=10)
        assert len(msgs) == 1  # always progress, like a real broker
        _hw, msgs = c.fetch("t", 0, 0, max_bytes=1 << 20)
        assert len(msgs) == 5


def test_concurrent_clients_are_isolated(broker):
    with KafkaWireClient(broker.host, broker.port) as c1, KafkaWireClient(
        broker.host, broker.port
    ) as c2:
        c1.produce("t", 0, [(b"a", b"1")])
        c2.produce("t", 1, [(b"b", b"2")])
        assert c1.list_offsets("t", 1) == 1
        assert c2.list_offsets("t", 0) == 1


# ---------------------------------------------------------------------------
# Spark DataSources over the broker
# ---------------------------------------------------------------------------


def test_batch_source_reads_all_partitions(spark):
    from zmaxion_spark.sources.kafka_source import ensure_demo_broker, read_kafka

    host, port = ensure_demo_broker(4, 50, topic="zmx-test-batch")
    df = read_kafka(spark, host, port, topic="zmx-test-batch")
    assert df.count() == 200
    got = {
        (r.partition, r.offset)
        for r in df.select("partition", "offset").collect()
    }
    assert got == {(p, o) for p in range(4) for o in range(50)}


def test_stream_source_resumes_from_checkpoint(spark, tmp_path):
    from zmaxion_spark.sources.kafka_source import (
        ensure_demo_broker,
        stream_kafka_loopback,
    )
    from zmaxion_spark.streaming.pipeline import run_to_parquet

    topic = "zmx-test-stream"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    host, port = ensure_demo_broker(2, 30, topic=topic)
    sdf = stream_kafka_loopback(spark, host, port, topic).select(
        "partition", "offset"
    )
    run_to_parquet(sdf, out, checkpoint=ckpt)
    assert spark.read.parquet(out).count() == 60
    ensure_demo_broker(2, 45, topic=topic)  # grow the log
    run_to_parquet(sdf, out, checkpoint=ckpt)
    back = spark.read.parquet(out)
    # exactly-once: 45 per partition, no rereads of the first 30
    assert back.count() == 90
    assert back.groupBy("partition", "offset").count().filter("count > 1").count() == 0
