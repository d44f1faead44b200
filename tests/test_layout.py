"""Layout & skew tooling — partition pruning, bucketed no-exchange
joins, salted-join equivalence (SCALE.md, executable form).
"""

from __future__ import annotations

import contextlib
import io
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from zmaxion_spark import layout
from zmaxion_spark.catalog import load_table


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_partitioned_write_enables_partition_pruning(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").withColumn(
        "ship_month", F.date_format("l_shipdate", "yyyy-MM")
    )
    with tempfile.TemporaryDirectory(prefix="zmx-layout-") as d:
        layout.write_partitioned(
            li, f"{d}/li", ["ship_month"], sort_by=["l_orderkey"]
        )
        back = spark.read.parquet(f"{d}/li").filter(F.col("ship_month") == "1995-03")
        plan = _plan(back)
        # Partition filter must be a directory-level prune, not a scan
        # filter over data columns.
        assert "PartitionFilters" in plan and "ship_month" in plan
        want = li.filter(F.col("ship_month") == "1995-03").count()
        assert back.count() == want


def test_bucketed_join_has_no_exchange(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # Force a non-broadcast join so the exchange question is real.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        layout.write_bucketed_table(
            orders, "zmx_orders_b", ["o_orderkey"], 8, sort_by=["o_orderkey"]
        )
        layout.write_bucketed_table(
            li.select("l_orderkey", "l_quantity"),
            "zmx_lineitem_b",
            ["l_orderkey"],
            8,
            sort_by=["l_orderkey"],
        )
        j = spark.table("zmx_orders_b").join(
            spark.table("zmx_lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        # Bucketed-on-key layout: the join must not shuffle either side.
        assert "Exchange" not in plan
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS zmx_orders_b")
        spark.sql("DROP TABLE IF EXISTS zmx_lineitem_b")


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey")
    salted = layout.salted_join(
        li, orders, "l_orderkey", salt_from=F.col("l_linenumber"), n_salts=4
    )
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_compact_rewrites_small_files(spark, tmp_path):
    """#123: 32 tiny files compact to 4 with identical content; the
    sorted variant keeps row-group skipping keys clustered."""
    from zmaxion_spark.layout import compact

    src = load_table(spark, SF_SMOKE, "orders").limit(2000)
    path = str(tmp_path / "smallfiles")
    src.repartition(32).write.parquet(path)
    want = sorted(r.o_orderkey for r in spark.read.parquet(path).collect())

    before, after = compact(spark, path, target_files=4, sort_by=["o_orderdate"])
    assert before == 32 and after == 4
    got = sorted(r.o_orderkey for r in spark.read.parquet(path).collect())
    assert got == want


def test_schema_evolution_merge_read(spark, tmp_path):
    """Reading across schema versions: an old snapshot without a
    column and a new one with it must union under mergeSchema, the
    missing column null-filled — the append-only evolution contract."""
    old = str(tmp_path / "v1")
    new = str(tmp_path / "v2")
    base = load_table(spark, SF_SMOKE, "orders").limit(100)
    base.select("o_orderkey", "o_totalprice").write.parquet(old)
    base.select(
        "o_orderkey", "o_totalprice", F.lit("eu-1").alias("region_tag")
    ).write.parquet(new)
    df = spark.read.option("mergeSchema", "true").parquet(old, new)
    assert set(df.columns) == {"o_orderkey", "o_totalprice", "region_tag"}
    assert df.count() == 200
    assert df.filter(F.col("region_tag").isNull()).count() == 100
