"""Declarative data-quality constraint suite — SURVEY §2.19 #186.

The Deequ-shaped surface every production table needs in front of it:
declare constraints once, evaluate them as ONE aggregation pass over
the table (plus one anti-join per foreign-key constraint), get back a
small per-constraint report frame. Constraints are data, not code —
the suite can live next to the table's schema and run after every
commit (pairs with txlog #175: a quality gate before publishing a
version).

Scale: all row-local constraints fold into a single Aggregate over
one scan (violations are SUM(CASE ...) counters — map-side combined,
one row out). Uniqueness adds exact distinct-counting (one shuffle on
the key); FK constraints add a broadcast anti-join probe per dim.
Nothing collects more than the one-row counters to the report.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class _FK:
    name: str
    col: str
    dim: DataFrame
    dim_col: str


@dataclass
class Check:
    """A named constraint suite over one table."""

    name: str
    _violation_exprs: list[tuple[str, Column]] = field(default_factory=list)
    _unique_sets: list[tuple[str, tuple[str, ...]]] = field(default_factory=list)
    _fks: list[_FK] = field(default_factory=list)

    # -- row-local constraints (fold into one aggregate) -------------------

    def _add(self, cname: str, bad_row: Column) -> "Check":
        self._violation_exprs.append(
            (cname, F.sum(F.when(bad_row, 1).otherwise(0)).cast("long"))
        )
        return self

    def not_null(self, col: str) -> "Check":
        return self._add(f"not_null({col})", F.col(col).isNull())

    def in_range(self, col: str, lo, hi) -> "Check":
        return self._add(
            f"in_range({col})",
            F.col(col).isNull() | ~F.col(col).between(lo, hi),
        )

    def isin(self, col: str, *allowed) -> "Check":
        return self._add(
            f"isin({col})", F.col(col).isNull() | ~F.col(col).isin(*allowed)
        )

    def matches(self, col: str, regex: str) -> "Check":
        return self._add(
            f"matches({col})",
            F.col(col).isNull() | ~F.col(col).rlike(regex),
        )

    # -- multi-row constraints ---------------------------------------------

    def is_unique(self, *cols: str) -> "Check":
        self._unique_sets.append((f"is_unique({','.join(cols)})", cols))
        return self

    def fk(self, col: str, dim: DataFrame, dim_col: str) -> "Check":
        self._fks.append(_FK(f"fk({col})", col, dim, dim_col))
        return self

    # -- evaluation --------------------------------------------------------

    def run(self, df: DataFrame) -> DataFrame:
        """Evaluate every constraint; returns (constraint_name, violations,
        passed) — one row per constraint. Row-local constraints share
        ONE aggregation over one scan; each is_unique adds a distinct
        count on its key; each fk adds a broadcast anti-join count."""
        reports: list[DataFrame] = []
        if self._violation_exprs:
            aggs = [
                expr.alias(f"c{i}")
                for i, (_, expr) in enumerate(self._violation_exprs)
            ]
            wide = df.agg(*aggs)
            stacked = wide.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(cname).alias("constraint_name"),
                                F.col(f"c{i}").alias("violations"),
                            )
                            for i, (cname, _) in enumerate(self._violation_exprs)
                        ]
                    )
                ).alias("r")
            ).select("r.constraint_name", "r.violations")
            reports.append(stacked)
        for cname, cols in self._unique_sets:
            dup = df.agg(
                (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]))
                .cast("long")
                .alias("violations")
            ).select(F.lit(cname).alias("constraint_name"), "violations")
            reports.append(dup)
        for fk in self._fks:
            orphans = (
                df.select(F.col(fk.col))
                .filter(F.col(fk.col).isNotNull())
                .join(
                    F.broadcast(fk.dim.select(F.col(fk.dim_col).alias(fk.col))),
                    fk.col,
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).cast("long").alias("violations"))
                .select(F.lit(fk.name).alias("constraint_name"), "violations")
            )
            reports.append(orphans)
        out = reports[0]
        for r in reports[1:]:
            out = out.unionByName(r)
        return out.withColumn("passed", F.col("violations") == 0)
