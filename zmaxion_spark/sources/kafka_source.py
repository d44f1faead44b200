"""Python DataSources over the loopback Kafka broker — SURVEY §2.1 #5.

The final piece of the #5 ``source_kafka`` slot: batch and streaming
consumers whose bytes come off a real TCP socket speaking the Kafka v0
wire protocol (``kafka_broker``), not an in-process simulator. The
topology downstream of the source — ``parse_kafka_topology``'s binary
JSON → typed columns — is byte-identical to what
``format("kafka").load()`` would feed on a real cluster.

Scale shape: one ``InputPartition`` per topic partition; each Spark
task opens its own client connection and fetch-loops its partition's
offset range (``Fetch`` caps frames at max_bytes; the loop advances by
the last delivered offset, exactly like a real consumer). Offsets are
the streaming checkpoint state, so crash replay re-fetches identical
byte ranges from the append-only log.

Payloads reuse ``pytopic.payload`` — every field a pure function of
(partition, offset) — so the DuckDB oracle reproduces the whole
produce→fetch→parse pipeline from ``generate_series`` arithmetic.
"""

from __future__ import annotations

import datetime
import json
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from zmaxion_spark.session import tune
from zmaxion_spark.streaming.pytopic import BASE_EPOCH, TOPIC_NAME, payload

_BROKERS: dict[tuple, object] = {}
_BROKER_LOCK = threading.Lock()


def _encode(partition: int, offset: int) -> tuple[bytes, bytes]:
    body = payload(partition, offset)
    return (
        str(body["event_id"]).encode(),
        json.dumps(body, sort_keys=True).encode(),
    )


def ensure_demo_broker(
    n_partitions: int = 4,
    rows_per_partition: int = 1000,
    topic: str = TOPIC_NAME,
) -> tuple[str, int]:
    """Start (once per driver) a loopback broker pre-loaded with the
    deterministic topic payloads; returns (host, port). Extra calls
    with a larger ``rows_per_partition`` produce the delta — the
    append-only log never rewrites offsets, so already-consumed ranges
    stay byte-identical (what checkpoint replay relies on)."""
    from zmaxion_spark.sources.kafka_broker import (
        KafkaWireClient,
        LoopbackKafkaBroker,
    )

    key = (n_partitions,)
    with _BROKER_LOCK:
        broker = _BROKERS.get(key)
        if broker is None:
            broker = LoopbackKafkaBroker(n_partitions=n_partitions)
            _BROKERS[key] = broker
        with KafkaWireClient(broker.host, broker.port) as c:
            for pid in range(n_partitions):
                have = c.list_offsets(topic, pid)
                if have < rows_per_partition:
                    c.produce(
                        topic,
                        pid,
                        [
                            _encode(pid, off)
                            for off in range(have, rows_per_partition)
                        ],
                    )
        return broker.host, broker.port


def _wire_row(topic: str, pid: int, off: int, key: bytes, value: bytes):
    # v0 messages carry no timestamp; the producer contract pins
    # CreateTime = BASE_EPOCH + offset, reconstructed deterministically.
    ts = datetime.datetime.fromtimestamp(
        BASE_EPOCH + off, tz=datetime.timezone.utc
    )
    return (key, value, topic, pid, off, ts, 0)


class _KafkaRange(InputPartition):
    def __init__(self, host: str, port: int, topic: str, pid: int, start: int, end: int):
        self.host = host
        self.port = port
        self.topic = topic
        self.pid = pid
        self.start = start
        self.end = end


def _fetch_range(part: _KafkaRange):
    """Executor-side fetch loop over one partition's offset range."""
    from zmaxion_spark.sources.kafka_broker import KafkaWireClient

    if part.start >= part.end:
        return
    with KafkaWireClient(part.host, part.port) as c:
        off = part.start
        while off < part.end:
            _hw, msgs = c.fetch(part.topic, part.pid, off, max_bytes=1 << 16)
            if not msgs:
                raise IOError(
                    f"broker served no data at {part.topic}/{part.pid}@{off}"
                )
            for o, k, v in msgs:
                if o >= part.end:
                    return
                yield _wire_row(part.topic, part.pid, o, k, v)
                off = o + 1


class _KafkaBatchReader(DataSourceReader):
    def __init__(self, options):
        self.host = options["host"]
        self.port = int(options["port"])
        self.topic = options.get("topic", TOPIC_NAME)

    def partitions(self):
        from zmaxion_spark.sources.kafka_broker import KafkaWireClient

        with KafkaWireClient(self.host, self.port) as c:
            pids = c.metadata([self.topic])[self.topic]
            return [
                _KafkaRange(
                    self.host,
                    self.port,
                    self.topic,
                    pid,
                    c.list_offsets(self.topic, pid, -2),
                    c.list_offsets(self.topic, pid, -1),
                )
                for pid in pids
            ]

    def read(self, part: _KafkaRange):
        return _fetch_range(part)


class KafkaSourceDataSource(DataSource):
    """``spark.read.format("zmx_kafka")`` — loopback-broker consumer."""

    @classmethod
    def name(cls) -> str:
        return "zmx_kafka"

    def schema(self):
        from zmaxion_spark.streaming.sources import KAFKA_WIRE_SCHEMA

        return KAFKA_WIRE_SCHEMA

    def reader(self, schema):
        return _KafkaBatchReader(self.options)


class _KafkaStreamReader(DataSourceStreamReader):
    """Offset-tracked streaming consumer: offsets are the per-partition
    log positions ``{"0": n0, "1": n1, ...}`` — Kafka's own offset
    model, checkpoint-durable and replay-exact."""

    def __init__(self, options):
        self.host = options["host"]
        self.port = int(options["port"])
        self.topic = options.get("topic", TOPIC_NAME)
        self._pids: list[int] | None = None

    def _client(self):
        from zmaxion_spark.sources.kafka_broker import KafkaWireClient

        return KafkaWireClient(self.host, self.port)

    def _partitions_list(self) -> list[int]:
        if self._pids is None:
            with self._client() as c:
                self._pids = c.metadata([self.topic])[self.topic]
        return self._pids

    def initialOffset(self) -> dict:
        return {str(pid): 0 for pid in self._partitions_list()}

    def latestOffset(self) -> dict:
        with self._client() as c:
            return {
                str(pid): c.list_offsets(self.topic, pid)
                for pid in self._partitions_list()
            }

    def partitions(self, start: dict, end: dict):
        parts = [
            _KafkaRange(
                self.host,
                self.port,
                self.topic,
                int(pid),
                start.get(pid, 0),
                e,
            )
            for pid, e in end.items()
            if e > start.get(pid, 0)
        ]
        # An empty range still needs one no-op partition (API contract).
        return parts or [
            _KafkaRange(self.host, self.port, self.topic, 0, 0, 0)
        ]

    def read(self, part: _KafkaRange):
        return _fetch_range(part)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the stream checkpoint


class KafkaStreamDataSource(DataSource):
    """``spark.readStream.format("zmx_kafka_stream")``."""

    @classmethod
    def name(cls) -> str:
        return "zmx_kafka_stream"

    def schema(self):
        from zmaxion_spark.streaming.sources import KAFKA_WIRE_SCHEMA

        return KAFKA_WIRE_SCHEMA

    def streamReader(self, schema):
        return _KafkaStreamReader(self.options)


def read_kafka(spark: SparkSession, host: str, port: int, topic: str = TOPIC_NAME) -> DataFrame:
    """Batch view of a loopback-broker topic (Kafka wire schema)."""
    tune(spark)
    spark.dataSource.register(KafkaSourceDataSource)
    return (
        spark.read.format("zmx_kafka")
        .option("host", host)
        .option("port", str(port))
        .option("topic", topic)
        .load()
    )


def stream_kafka_loopback(
    spark: SparkSession, host: str, port: int, topic: str = TOPIC_NAME
) -> DataFrame:
    """Unbounded view of a loopback-broker topic (offset-tracked)."""
    tune(spark)
    spark.dataSource.register(KafkaStreamDataSource)
    return (
        spark.readStream.format("zmx_kafka_stream")
        .option("host", host)
        .option("port", str(port))
        .option("topic", topic)
        .load()
    )
