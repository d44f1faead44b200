"""Catalog loader robustness — the events.ts type changed between
testdata generations (int64 epoch-ns in round 1-2, parquet
timestamp[us] in round 3) and broke 14 graded queries; these tests
pin normalize_events_ts to produce identical values for EVERY format
a generator has shipped, so the next regeneration cannot break the
loader silently."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from zmaxion_spark.catalog import load_table, normalize_events_ts
from tests.conftest import SF_SMOKE

_UTC = datetime.timezone.utc
_POINTS = [
    datetime.datetime(2024, 1, 1, 0, 0, 0, 123456, tzinfo=_UTC),
    datetime.datetime(2024, 6, 15, 23, 59, 59, 999999, tzinfo=_UTC),
    datetime.datetime(2025, 12, 31, 12, 30, 0, 1, tzinfo=_UTC),
]


def _micros(dt: datetime.datetime) -> int:
    return int(dt.timestamp() * 1_000_000)


def test_normalize_events_ts_all_generator_formats(spark):
    naive = [p.replace(tzinfo=None) for p in _POINTS]
    as_long_ns = spark.createDataFrame(
        [(_micros(p) * 1000,) for p in _POINTS],
        T.StructType([T.StructField("ts", T.LongType())]),
    )
    as_ts = spark.createDataFrame(
        [(p,) for p in naive],
        T.StructType([T.StructField("ts", T.TimestampType())]),
    )
    as_ntz = spark.createDataFrame(
        [(p,) for p in naive],
        T.StructType([T.StructField("ts", T.TimestampNTZType())]),
    )
    outs = [
        sorted(r["ts"] for r in normalize_events_ts(df).collect())
        for df in (as_long_ns, as_ts, as_ntz)
    ]
    assert outs[0] == outs[1] == outs[2] == sorted(naive)
    for df in (as_long_ns, as_ts, as_ntz):
        assert isinstance(
            normalize_events_ts(df).schema["ts"].dataType, T.TimestampType
        )


def test_events_loader_matches_duckdb_timestamps(spark):
    """The loaded events.ts must equal DuckDB's naive view of the same
    file to the microsecond — the invariant every oracle pair rests on."""
    import duckdb

    con = duckdb.connect()
    got_all = load_table(spark, SF_SMOKE, "events").agg(
        F.min("ts").alias("mn"), F.max("ts").alias("mx")
    ).collect()[0]
    want_all = con.execute(
        f"SELECT MIN(CAST(ts AS TIMESTAMP)), MAX(CAST(ts AS TIMESTAMP)) "
        f"FROM '{SF_SMOKE}/events.parquet'"
    ).fetchone()
    assert got_all["mn"] == want_all[0]
    assert got_all["mx"] == want_all[1]
