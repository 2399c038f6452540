from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from relational_query_engine_sql_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
# overridable so the full differential suite can run at a larger scale
# factor (e.g. SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.1) before a
# round closes
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
