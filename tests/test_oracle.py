"""Oracle-differential tests: every registry query vs DuckDB at sf0.001.

This is the same comparison the driver's correctness gate performs at
sf0.01 (row-count + schema + order-insensitive values), run at the
smoke scale factor so the suite stays fast.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from zmaxion_spark.queries import REGISTRY
from zmaxion_spark.testing import run_query_pair


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    res = run_query_pair(spark, duck, REGISTRY[name], SF_SMOKE)
    assert res.ok, f"{name}: {res.detail}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == [
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "sum_charge", "avg_qty", "avg_price", "avg_disc",
        "count_order",
    ]


def test_contract_shapes():
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip().upper().startswith(("SELECT", "WITH")) for s in osql.values())
