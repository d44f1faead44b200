"""Graded query registry.

Every implemented operator from SURVEY.md §2 is exercised by at least
one named query registered here. A registration carries:

- ``fn(spark, sf_dir) -> DataFrame``  — the Spark-side query,
- ``oracle``                          — equivalent DuckDB ANSI SQL
  (None → non-SQL-expressible; driver runs a rows-only check),
- ``operators``                       — SURVEY §2 inventory ids covered.

``__spark_entry__.py`` (the driver contract), pytest, and bench.py all
derive from this single table, so a query cannot pass tests with a
different definition than the one the driver grades.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    operators: tuple[int, ...]
    doc: str = ""
    bench: bool = True  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def query(
    name: str,
    oracle: str | None = None,
    operators: tuple[int, ...] = (),
    doc: str = "",
    bench: bool = True,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a graded query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, tuple(operators), doc or (fn.__doc__ or ""), bench)
        return fn

    return deco


def covered_operators() -> set[int]:
    out: set[int] = set()
    for q in REGISTRY.values():
        out.update(q.operators)
    return out
