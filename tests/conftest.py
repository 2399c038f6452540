from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from relational_query_engine_sql_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
# CI default is the smallest SF so `pytest tests/ -q` stays under the
# 5-minute budget as the registry grows (the differential suite is
# ~253 parameterized cases). The STRICT gate at the driver's sf0.01
# is tools/driver_sim.py (hash compare, no float tolerance) — run it
# before a round closes; this suite's job in CI is catching breakage
# fast. Override for a full-scale pass:
#   SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.01 python -m pytest tests/
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")

# Hypothesis example count for the Spark-heavy property tests (each
# example is 1-4 full Spark jobs, so examples dominate those tests'
# wall time). CI default keeps the property checks meaningful while
# fitting the time budget; the pre-round-close full pass raises it:
#   SPARK_GRAFT_PROP_EXAMPLES=10 python -m pytest tests/ -q
PROP_EXAMPLES = int(os.environ.get("SPARK_GRAFT_PROP_EXAMPLES", "4"))


@pytest.fixture(scope="session")
def spark():
    # 4 threads, 4 shuffle partitions: measured sweet spot (round 5).
    # The suite is dominated by LATENCY of tiny sequential jobs, so
    # task count per stage is the cost driver: 16 threads was ~2x
    # slower than 8 (round 4), and 4/4 beat 8/8 by another ~20% on the
    # commit-protocol scenarios (148s -> 116s on test_txnlog.py) while
    # the thread-pooled parity suite stayed flat within VM noise.
    # Re-measure before changing — don't guess.
    s = get_spark(
        app_name="tests",
        cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "4")),
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_TEST_SHUFFLE", "4")
        ),
    )
    yield s


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
