"""Headline benchmark: run registry queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
{"metric": "total_query_sec", "value": N, "unit": "sec",
 "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is executed to completion via the no-op sink (full plan
runs, nothing collected to the driver) after a warm-up of the JVM and
the parquet footers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from zmaxion_spark.queries import REGISTRY  # noqa: E402
from zmaxion_spark.session import get_spark  # noqa: E402


def run_one(spark, q, sf_dir: str) -> float:
    t0 = time.time()
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("zmaxion-bench")

    # Default: the headline set (q.bench). SPARK_GRAFT_BENCH_ALL=1
    # folds in the bench=False queries too (fixture-writing and
    # shape-duplicate demos excluded from the driver's headline number
    # but still timed in the local full-registry record).
    # Positional args name specific queries (round-9 verdict #7: the
    # REGRESSIONS.md reproduce-standalone rule should cost seconds,
    # not a suite run): `python bench.py q_graph_2hop [q_rollup ...]`.
    bench_all = os.environ.get("SPARK_GRAFT_BENCH_ALL") == "1"
    # No flags are defined; a '-'-prefixed arg is a typo that would
    # otherwise silently fall through to the default headline set (and,
    # with no named queries left, overwrite BENCH_local.json with the
    # wrong run). Same exit-2 path as unknown query names (ADVICE r10).
    flags = [a for a in sys.argv[1:] if a.startswith("-")]
    if flags:
        print(f"bench: unrecognized arguments: {flags}", file=sys.stderr)
        sys.exit(2)
    cli_names = sys.argv[1:]
    if cli_names:
        unknown = [n for n in cli_names if n not in REGISTRY]
        if unknown:
            print(f"bench: unknown queries: {unknown}", file=sys.stderr)
            sys.exit(2)
        names = cli_names
    else:
        names = [n for n, q in sorted(REGISTRY.items()) if q.bench or bench_all]
    # Warm up: JVM, codegen, parquet footer cache — not graded.
    try:
        run_one(spark, REGISTRY[names[0]], sf_dir)
    except Exception:
        pass  # a broken warm-up query must not sink the whole record
    # Python-DataSource machinery warm-up (round 12, measurement fix —
    # OPTIMIZATION_r12.md "q_kafka_roundtrip"): the FIRST DataSource use
    # in a session spawns several distinct Python worker-module daemons
    # (create/plan/read), each importing pyspark — measured ~8.7 s of
    # session infrastructure billed to whichever datasource query runs
    # first (alphabetically q_kafka_roundtrip, which steady-states at
    # ~1.2 s). Same warm-up class as the JVM/codegen line above; a
    # 1-row topic read keeps the warm-up itself sub-second thereafter.
    try:
        from zmaxion_spark.streaming.pytopic import read_topic

        read_topic(spark, rows_per_partition=1, partitions=1).write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:
        pass
    # ... and the Python-DataSink write path (its own worker modules:
    # plan-write/commit — measured ~6 s first-use, billed to
    # q_python_datasink without this). One 1-row manifest write to /tmp.
    try:
        import shutil
        import tempfile

        from zmaxion_spark.streaming.pysink import TopicSinkDataSource

        spark.dataSource.register(TopicSinkDataSource)
        _wd = tempfile.mkdtemp(prefix="zmx-bench-warm-")
        (
            spark.range(1)
            .selectExpr("'warm' AS k", "id AS v")
            .write.format("zmx_topic_sink")
            .option("path", _wd)
            .mode("append")
            .save()
        )
        shutil.rmtree(_wd, ignore_errors=True)
    except Exception:
        pass

    # Round-2 lesson: one raising query turned BENCH_r02.json into a
    # crash record with zero timings. Isolate failures per query so a
    # single regression can never erase the round's perf evidence.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        try:
            timings[name] = round(run_one(spark, REGISTRY[name], sf_dir), 3)
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"[:200]

    out = {
        "metric": "total_query_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    if bench_all:
        out["mode"] = "full-registry"
    print(json.dumps(out))
    # The driver snapshots only the LAST 2000 chars of stdout into
    # BENCH_r{N}.json, which clips ~160 queries' timings. Keep the full
    # record locally so round-over-round perf diffs stay possible.
    # Full-registry runs additionally persist to BENCH_full.json, which
    # the driver's headline runs never clobber.
    here = os.path.dirname(os.path.abspath(__file__))
    # Named standalone runs are for triage only — never clobber the
    # round-over-round records with a partial timing set.
    targets = [] if cli_names else (
        ["BENCH_local.json"] + (["BENCH_full.json"] if bench_all else [])
    )
    for fname in targets:
        try:
            with open(os.path.join(here, fname), "w") as f:
                json.dump(out, f, indent=1, sort_keys=True)
        except OSError:
            pass  # a read-only checkout must not fail the bench
    if errors:
        print(f"bench: {len(errors)} queries errored: {sorted(errors)}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
