"""Python DataSource sink (#257): two-phase commit protocol tests."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from zmaxion_spark.streaming.pysink import (
    TopicSinkDataSource,
    committed_batch_ids,
    read_sink,
)

_SCHEMA = "k bigint, v string"


def _write(spark, path, rows):
    spark.dataSource.register(TopicSinkDataSource)
    df = spark.createDataFrame(rows, _SCHEMA)
    df.repartition(3).write.format("zmx_topic_sink").option(
        "path", path
    ).mode("append").save()


def test_commit_publishes_exactly_written_rows(spark, tmp_path):
    path = str(tmp_path / "sink")
    rows = [(i, f"v{i}") for i in range(50)]
    _write(spark, path, rows)
    back = read_sink(spark, path, _SCHEMA)
    assert sorted((r.k, r.v) for r in back.collect()) == sorted(rows)
    # one manifest, all part files accounted for
    manifests = [f for f in os.listdir(path) if f.startswith("manifest-")]
    assert len(manifests) == 1
    with open(os.path.join(path, manifests[0])) as f:
        body = json.load(f)
    assert sum(e["rows"] for e in body["files"]) == 50
    assert body["batch_id"] is None


def test_orphan_part_files_are_invisible(spark, tmp_path):
    path = str(tmp_path / "sink")
    _write(spark, path, [(1, "a")])
    with open(os.path.join(path, "parts", "part-orphan.jsonl"), "w") as f:
        f.write('{"k": 999, "v": "ghost"}\n')
    back = read_sink(spark, path, _SCHEMA)
    assert {r.k for r in back.collect()} == {1}


def test_appends_accumulate_manifests(spark, tmp_path):
    path = str(tmp_path / "sink")
    _write(spark, path, [(1, "a")])
    _write(spark, path, [(2, "b")])
    assert len([f for f in os.listdir(path) if f.startswith("manifest-")]) == 2
    back = read_sink(spark, path, _SCHEMA)
    assert {r.k for r in back.collect()} == {1, 2}


def test_empty_sink_reads_empty_typed_frame(spark, tmp_path):
    path = str(tmp_path / "nothing")
    back = read_sink(spark, path, _SCHEMA)
    assert back.count() == 0
    assert [f.name for f in back.schema.fields] == ["k", "v"]


def test_stream_replay_is_idempotent_by_batch_id(spark, tmp_path):
    """Replaying the SAME micro-batches against the sink (fresh
    checkpoint, so Spark re-delivers every batch id) must not
    double-publish: the StreamWriter skips committed batch ids and
    drops the replayed part files."""
    import tempfile

    spark.dataSource.register(TopicSinkDataSource)
    src = str(tmp_path / "src")
    schema = T.StructType([T.StructField("k", T.LongType())])
    for i in range(3):
        spark.createDataFrame([(i * 10 + j,) for j in range(5)], schema).coalesce(
            1
        ).write.mode("append").parquet(src)
    sink = str(tmp_path / "sink")
    os.makedirs(sink, exist_ok=True)

    def drain():
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            sdf.writeStream.format("zmx_topic_sink")
            .option("path", sink)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="zmx-ck-"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    first = sorted(r.k for r in read_sink(spark, sink, "k bigint").collect())
    assert len(first) == 15
    n_batches = len(committed_batch_ids(sink))
    drain()  # fresh checkpoint -> every batch id replayed -> all skipped
    again = sorted(r.k for r in read_sink(spark, sink, "k bigint").collect())
    assert again == first, "replay double-published rows"
    assert committed_batch_ids(sink) == set(range(n_batches))
    # replayed parts were dropped, not leaked
    parts = os.listdir(os.path.join(sink, "parts"))
    assert len(parts) == n_batches
