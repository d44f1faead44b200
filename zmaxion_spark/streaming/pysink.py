"""Python DataSource SINK — SURVEY §2.14 #257 (writer twin of #136).

Spark 4's Python DataSource API also covers the WRITE side: a
``DataSourceWriter`` receives each task's row iterator on the
executors and returns a serializable commit message; the driver then
calls ``commit`` (all tasks succeeded) or ``abort`` (any failed) with
the collected messages — the classic two-phase distributed commit,
surfaced in pure Python. This module implements a *topic sink* with
the manifest-gated atomic-publish discipline the txlog uses:

- every task writes one JSON-lines part file under ``<path>/parts/``
  with a uuid name (never clobbers, never partial-visible),
- its commit message carries (file, row count),
- ``commit`` writes ``<path>/manifest-<n>.json`` listing exactly the
  committed files — readers resolve the LATEST manifest and read only
  files it lists, so a crashed/aborted job's orphan part files are
  invisible (and ``abort`` best-effort unlinks them),
- the streaming variant keys manifests by micro-batch id and SKIPS a
  batch id that is already committed — the same (source, batchId)
  idempotent replay contract as ``TxTable.append_batch`` (#178), which
  is exactly-once end-to-end under foreachBatch-style retries.

Scale: the data path is executor-parallel (one part file per task,
no driver round-trip for rows); only the O(tasks) commit messages
fold at the driver, identical to every production commit protocol
(parquet's file commit, Delta's transaction log).

DEPLOYMENT REQUIREMENT — shared filesystem. ``_write_part`` writes
with plain ``os``/``open`` on the EXECUTOR's local filesystem while
``commit``/``abort`` and the ``read_sink`` helpers run on the DRIVER:
the protocol is only correct when driver and executors see one
filesystem (local mode, NFS, or a FUSE-mounted object store). On a
multi-node cluster without one, commit would publish part-file names
the driver-side readers cannot see. To deploy beyond that, swap the
``os``-module calls for a filesystem abstraction (fsspec / Hadoop FS
through the JVM) — the two-phase commit protocol itself is
placement-agnostic.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

SINK_NAME = "zmx_topic_sink"


@dataclass
class _PartCommit(WriterCommitMessage):
    file: str
    rows: int


def _write_part(path: str, iterator) -> _PartCommit:
    """Task-side data path: stream rows into one uuid part file."""
    parts = os.path.join(path, "parts")
    os.makedirs(parts, exist_ok=True)
    fname = f"part-{uuid.uuid4().hex}.jsonl"
    n = 0
    tmp = os.path.join(parts, fname + ".tmp")
    with open(tmp, "w") as f:
        for row in iterator:
            f.write(json.dumps(row.asDict(), sort_keys=True, default=str))
            f.write("\n")
            n += 1
    os.rename(tmp, os.path.join(parts, fname))  # atomic within the task
    return _PartCommit(file=fname, rows=n)


def _manifest_paths(path: str) -> list[str]:
    return sorted(
        f for f in os.listdir(path) if f.startswith("manifest-")
    ) if os.path.isdir(path) else []


def _publish(path: str, files: list[dict], batch_id: int | None) -> None:
    """Atomic manifest publish (tmp + rename), one manifest per job /
    micro-batch; readers take the union of manifests. The name carries
    a sequence prefix for human ordering plus a uuid suffix so two
    CONCURRENT committers can never rename onto the same manifest
    (POSIX rename overwrites silently — with a bare counter the loser's
    commit would vanish); nothing on the read side depends on the
    counter being gapless."""
    n = len(_manifest_paths(path))
    body = {"files": files, "batch_id": batch_id}
    name = f"manifest-{n:08d}-{uuid.uuid4().hex[:8]}.json"
    tmp = os.path.join(path, "." + name + ".tmp")
    with open(tmp, "w") as f:
        json.dump(body, f, sort_keys=True)
    os.rename(tmp, os.path.join(path, name))


def committed_batch_ids(path: str) -> set[int]:
    ids = set()
    for m in _manifest_paths(path):
        with open(os.path.join(path, m)) as f:
            b = json.load(f).get("batch_id")
        if b is not None:
            ids.add(b)
    return ids


def _abort(path: str, messages) -> None:
    for m in messages:
        if m is not None:
            try:
                os.unlink(os.path.join(path, "parts", m.file))
            except OSError:
                pass  # best-effort; orphans are manifest-invisible anyway


class _TopicSinkWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator) -> _PartCommit:
        return _write_part(self.path, iterator)

    def commit(self, messages) -> None:
        _publish(
            self.path,
            [{"file": m.file, "rows": m.rows} for m in messages if m],
            batch_id=None,
        )

    def abort(self, messages) -> None:
        _abort(self.path, messages)


class _TopicSinkStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator) -> _PartCommit:
        return _write_part(self.path, iterator)

    def commit(self, messages, batchId: int) -> None:
        if batchId in committed_batch_ids(self.path):
            # Replayed micro-batch (restart after a commit raced the
            # checkpoint): drop its part files instead of re-publishing
            # — the idempotence half of exactly-once.
            _abort(self.path, messages)
            return
        _publish(
            self.path,
            [{"file": m.file, "rows": m.rows} for m in messages if m],
            batch_id=batchId,
        )

    def abort(self, messages, batchId: int) -> None:
        _abort(self.path, messages)


class TopicSinkDataSource(DataSource):
    """``df.write.format("zmx_topic_sink").option("path", ...)`` and
    ``writeStream.format("zmx_topic_sink")`` — manifest-committed."""

    @classmethod
    def name(cls) -> str:
        return SINK_NAME

    def writer(self, schema, overwrite: bool):
        return _TopicSinkWriter(self.options)

    def streamWriter(self, schema, overwrite: bool):
        return _TopicSinkStreamWriter(self.options)


def read_sink(spark, path: str, schema: str):
    """Read back ONLY manifest-committed part files (orphans from
    aborted/in-flight jobs are invisible — the read side of the commit
    protocol). Returns an empty frame of the given schema when nothing
    committed yet."""
    files = []
    for m in _manifest_paths(path):
        with open(os.path.join(path, m)) as f:
            files += [
                os.path.join(path, "parts", e["file"])
                for e in json.load(f)["files"]
            ]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)
