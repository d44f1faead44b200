"""Spark 4 SQL-surface operators — SURVEY.md §2.16 (#167–#171).

The declarative API additions a reference user would reach for first
on Spark 4: SQL-defined scalar UDFs (CREATE FUNCTION … RETURN expr —
optimizer-inlined, unlike Python UDFs), the SQL pipe syntax (|>),
string collations, error-safe try_* arithmetic, and parameterized
``spark.sql`` (injection-safe named arguments). Each is graded with a
DuckDB oracle that states the same semantics in portable ANSI SQL.

These matter at 100 TB precisely because they are NOT new execution
machinery: a SQL UDF inlines into the calling plan (codegen, partial
aggregation, pushdown all still apply), pipe syntax parses to the
same logical plan as the nested SELECT, a collation is a property of
the comparison not a function call wrapping every row, and try_*
expressions keep error handling row-local instead of job-fatal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zmaxion_spark.catalog import load_table
from zmaxion_spark.queries.helpers import DEC
from zmaxion_spark.queries.registry import query


def _view(spark: SparkSession, sf_dir: str, name: str) -> None:
    load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# ---------------------------------------------------------------------------
# #167 SQL-defined scalar UDF (CREATE FUNCTION ... RETURN expr)
# ---------------------------------------------------------------------------


@query(
    "q_sql_udf",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(38,6))) AS DOUBLE) AS disc_revenue,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                             AS DECIMAL(38,6))) AS DOUBLE) AS charged
        FROM lineitem
        GROUP BY l_returnflag
    """,
    operators=(24, 167),
    doc="SQL-defined scalar UDFs (#167, Spark 4 CREATE FUNCTION ... "
    "RETURN expr): business logic named once in SQL and reused across "
    "queries — and, unlike a Python UDF, INLINED by the optimizer into "
    "the calling expression tree, so codegen, partial aggregation and "
    "pushdown are untouched (the oracle is literally the inlined "
    "expression). This is the right default for shared row-local "
    "logic at 100 TB; Python UDFs are for logic SQL cannot express. "
    "Functions are created OR REPLACE so registration is idempotent "
    "per session.",
)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION zmx_disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION zmx_charge(p DOUBLE, d DOUBLE, t DOUBLE) "
        "RETURNS DOUBLE RETURN zmx_disc_price(p, d) * (1 + t)"
    )
    return spark.sql(
        f"""
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(zmx_disc_price(l_extendedprice, l_discount)
                             AS {DEC})) AS DOUBLE) AS disc_revenue,
               CAST(SUM(CAST(zmx_charge(l_extendedprice, l_discount, l_tax)
                             AS {DEC})) AS DOUBLE) AS charged
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


# ---------------------------------------------------------------------------
# #168 SQL pipe syntax (|>)
# ---------------------------------------------------------------------------


@query(
    "q_pipe_syntax",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                   AS total_price
        FROM orders
        WHERE o_orderstatus = 'O'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    operators=(23, 168),
    doc="SQL pipe syntax (#168, Spark 4): the linear FROM |> WHERE |> "
    "AGGREGATE |> ORDER BY form of the classic nested SELECT — parses "
    "to the IDENTICAL logical plan (verified: same aggregate, same "
    "pushdown), so it is pure ergonomics with zero plan cost; graded "
    "to pin that equivalence against the nested-form oracle.",
)
def q_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        FROM orders
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE)
                         AS total_price
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        """
    ).select("o_orderpriority", "n_orders", "total_price")


# ---------------------------------------------------------------------------
# #169 string collations (UTF8_LCASE)
# ---------------------------------------------------------------------------


@query(
    "q_collation",
    oracle="""
        WITH m AS (
            SELECT CASE WHEN user_id % 2 = 0 THEN UPPER(event_type)
                        ELSE event_type END AS mixed,
                   value
            FROM events
        )
        SELECT MIN(mixed) AS variant_min,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
        FROM m
        GROUP BY LOWER(mixed)
    """,
    operators=(41, 169),
    doc="String collations (#169, Spark 4): grouping on a COLLATE "
    "UTF8_LCASE column merges case variants ('CLICK' and 'click') as a "
    "property of the COMPARISON — no LOWER() wrapped around every row, "
    "and the same collation drives joins, sorts and equality "
    "everywhere the column flows. The oracle states the classic "
    "GROUP BY LOWER() workaround; MIN(mixed) (binary order, uppercase "
    "first — identical in both engines) pins a deterministic "
    "representative per class. Mixed-case input is synthesized from "
    "user_id parity so every class genuinely contains both cases.",
)
def q_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    mixed = F.when(
        F.col("user_id") % 2 == 0, F.upper("event_type")
    ).otherwise(F.col("event_type"))
    m = e.select(mixed.alias("mixed"), "value")
    return m.groupBy(
        F.collate(F.col("mixed"), "UTF8_LCASE").alias("_k")
    ).agg(
        F.min(F.collate(F.col("mixed"), "UTF8_BINARY")).alias("variant_min"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
    ).drop("_k")


# ---------------------------------------------------------------------------
# #170 error-safe try_* expressions
# ---------------------------------------------------------------------------


@query(
    "q_try_functions",
    oracle="""
        SELECT event_id,
               CASE WHEN user_id % 3 = 0 THEN NULL
                    ELSE value / (user_id % 3) END AS safe_ratio,
               TRY_CAST(event_type AS BIGINT) AS not_a_number,
               LIST_EXTRACT(STRING_SPLIT(event_type, 'i'),
                            CAST(user_id % 4 + 1 AS INTEGER)) AS maybe_part
        FROM events
    """,
    operators=(9, 170),
    doc="Error-safe expression family (#170): try_divide (NULL on /0), "
    "try_cast (NULL on malformed input) and try_element_at (NULL "
    "out-of-bounds) keep dirty-data failures ROW-LOCAL — the "
    "difference between one NULL and a dead 100 TB job under ANSI "
    "mode. Oracle: the explicit CASE/TRY_CAST/list-extract semantics "
    "(both engines index lists 1-based and return NULL past the end; "
    "index stays >= 1 — even try_element_at rejects literal 0). "
    "Division is a single IEEE op on identical operands — bit-exact "
    "without decimal detours.",
)
def q_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    idx = (F.col("user_id") % 4 + 1).cast("int")
    return e.select(
        "event_id",
        F.try_divide(F.col("value"), (F.col("user_id") % 3).cast("double")).alias(
            "safe_ratio"
        ),
        F.try_to_number(F.col("event_type"), F.lit("999")).cast("bigint").alias(
            "not_a_number"
        ),
        F.try_element_at(F.split("event_type", "i"), idx).alias("maybe_part"),
    )


# ---------------------------------------------------------------------------
# #171 parameterized SQL (named arguments)
# ---------------------------------------------------------------------------

_P_QTY = 45.0
_P_SEGMENT = "BUILDING"


@query(
    "q_param_sql",
    oracle=f"""
        SELECT c_mktsegment,
               COUNT(*) AS n_big,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty_sum
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_quantity >= {_P_QTY} AND c_mktsegment <> '{_P_SEGMENT}'
        GROUP BY c_mktsegment
    """,
    operators=(13, 171),
    doc="Parameterized SQL (#171, spark.sql(…, args=…)): named :params "
    "bound as LITERALS by the parser — injection-safe by construction "
    "(a hostile string can never become syntax) and plan-cache "
    "friendly (same text, different args). The bound literals behave "
    "exactly like inlined constants for pushdown: the :qty bound "
    "filter lands in the parquet scan. Oracle: the same query with "
    "constants inlined.",
)
def q_param_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "orders", "customer"):
        _view(spark, sf_dir, t)
    return spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS n_big,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty_sum
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_quantity >= :qty AND c_mktsegment <> :segment
        GROUP BY c_mktsegment
        """,
        args={"qty": _P_QTY, "segment": _P_SEGMENT},
    )
