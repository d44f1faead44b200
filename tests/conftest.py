from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from zmaxion_spark.session import get_spark

    s = get_spark("zmaxion-tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    from zmaxion_spark.testing import duckdb_connect

    return duckdb_connect(SF_SMOKE)


@pytest.fixture(scope="session")
def duck_sf001():
    from zmaxion_spark.testing import duckdb_connect

    return duckdb_connect(SF_CORRECT)
