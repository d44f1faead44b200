"""Python DataSource topic simulator — SURVEY §2.14 #136.

Spark 4's Python DataSource API (``pyspark.sql.datasource``) lets the
engine define first-class sources without a JVM connector. This
module implements a deterministic *topic* source that emits exactly
the Kafka wire schema (binary key/value, topic, partition, offset,
timestamp, timestampType) — so the broker-less half of the #5 Kafka
design slot is now runtime-verified end-to-end: the SAME
``parse_kafka_topology`` projection that would consume a real broker
runs against this source's frames, typed columns come out, and the
DuckDB oracle reproduces the payload arithmetic from generate_series.

Determinism: every field is a pure function of (partition, offset) —
no RNG, no wall clock — so reruns, engines and executors agree.

Scale: partitions() returns one InputPartition per topic partition;
Spark schedules them across executors like any scan. A real broker
source differs only in where read() pulls bytes from; the projection,
schema discipline, and downstream topology are identical.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from zmaxion_spark.session import tune

TOPIC_NAME = "zmx-events"
EVENT_TYPES = ("click", "view", "purchase", "signup", "refund")
BASE_EPOCH = 1_700_000_000  # fixed; timestamps are BASE_EPOCH + offset seconds


def payload(partition: int, offset: int) -> dict:
    """The deterministic message body for (partition, offset) —
    shared by the source (encode side) and tests; the DuckDB oracle
    reimplements the same arithmetic in SQL."""
    gid = partition * 1_000_000 + offset
    return {
        "event_id": gid,
        "etype": EVENT_TYPES[(offset * 7 + partition) % len(EVENT_TYPES)],
        "amount": (offset * 31 + partition * 17) % 1000,
    }


class _TopicPartition(InputPartition):
    def __init__(self, pid: int, n_rows: int):
        self.pid = pid
        self.n_rows = n_rows


class _TopicReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rowsperpartition", "1000"))
        self.n_parts = int(options.get("partitions", "4"))

    def partitions(self):
        return [_TopicPartition(i, self.n_rows) for i in range(self.n_parts)]

    def read(self, part: _TopicPartition):
        import datetime

        for off in range(part.n_rows):
            body = payload(part.pid, off)
            ts = datetime.datetime.fromtimestamp(
                BASE_EPOCH + off, tz=datetime.timezone.utc
            )
            yield (
                str(body["event_id"]).encode(),          # key: binary
                json.dumps(body, sort_keys=True).encode(),  # value: binary JSON
                TOPIC_NAME,
                part.pid,
                off,
                ts,
                0,  # timestampType: CreateTime
            )


class TopicDataSource(DataSource):
    """``spark.read.format("zmx_topic")`` — Kafka-wire-compatible."""

    @classmethod
    def name(cls) -> str:
        return "zmx_topic"

    def schema(self):
        from zmaxion_spark.streaming.sources import KAFKA_WIRE_SCHEMA

        return KAFKA_WIRE_SCHEMA

    def reader(self, schema):
        return _TopicReader(self.options)


def read_topic(
    spark: SparkSession,
    rows_per_partition: int = 1000,
    partitions: int = 4,
) -> DataFrame:
    """Load the simulated topic as a batch DataFrame (wire schema)."""
    tune(spark)
    # registration is idempotent; keying a cache by id(spark) would
    # break when ids are recycled after GC, so just always register
    spark.dataSource.register(TopicDataSource)
    return (
        spark.read.format("zmx_topic")
        .option("rowsperpartition", str(rows_per_partition))
        .option("partitions", str(partitions))
        .load()
    )


# ---------------------------------------------------------------------------
# Streaming half (#137): offset-tracked topic consumption with resume
# ---------------------------------------------------------------------------


class _TopicStreamReader(SimpleDataSourceStreamReader):
    """SimpleDataSourceStreamReader over the same deterministic topic.

    Offsets are {"off": n}; each micro-batch serves ``step`` messages.
    readBetweenOffsets makes replay after failure exact — determinism
    does the rest."""

    def __init__(self, options):
        self.total = int(options.get("rows", "2000"))
        self.step = int(options.get("steprows", "500"))

    def initialOffset(self):
        return {"off": 0}

    def _rows(self, s: int, e: int):
        # Materialized list, not a generator: Spark's prefetch cache
        # copy.copy()s the returned iterator, and generators can't be
        # copied. Batches are step-bounded so this stays small.
        out = []
        for off in range(s, e):
            body = payload(0, off)
            out.append((off, body["etype"], body["amount"]))
        return out

    def read(self, start):
        s = start["off"]
        e = min(s + self.step, self.total)
        return iter(self._rows(s, e)), {"off": e}

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(start["off"], end["off"]))


class TopicStreamDataSource(DataSource):
    """``spark.readStream.format("zmx_topic_stream")``."""

    @classmethod
    def name(cls) -> str:
        return "zmx_topic_stream"

    def schema(self):
        from pyspark.sql import types as T

        return T.StructType(
            [
                T.StructField("offset", T.LongType()),
                T.StructField("etype", T.StringType()),
                T.StructField("amount", T.LongType()),
            ]
        )

    def simpleStreamReader(self, schema):
        return _TopicStreamReader(self.options)


def stream_topic(
    spark: SparkSession, rows: int = 2000, step: int = 500
) -> DataFrame:
    """Unbounded view of the simulated topic (offset-tracked)."""
    tune(spark)
    spark.dataSource.register(TopicStreamDataSource)
    return (
        spark.readStream.format("zmx_topic_stream")
        .option("rows", str(rows))
        .option("steprows", str(step))
        .load()
    )
