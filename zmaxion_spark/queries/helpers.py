"""Oracle-parity helpers.

Floating-point discipline (SURVEY.md §5 rule 1): a double SUM is
order-dependent, and Spark and DuckDB will visit rows in different
orders — so any query whose hash must match the oracle sums through
``DECIMAL(38,6)`` (exact, order-independent) and casts the final
result back to DOUBLE. The double->decimal cast and decimal->double
cast are both correctly-rounded in both engines, so results are
bit-exact, no rounding fudge needed.

AVG is expressed as exact-decimal SUM divided by COUNT — again
bit-exact because it is one IEEE division of identical operands.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent exact sum of a double column, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent avg: exact decimal sum / count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
