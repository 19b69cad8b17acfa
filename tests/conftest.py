import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the suite spawns many short-lived sessions (CLI subprocesses, scaling
# children) that never amortize the once-per-app Python worker pre-warm —
# keep suite wall time unchanged; bench/production paths leave it on
os.environ.setdefault("SPARK_GRAFT_PY_PREWARM", "0")

from ton_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ton_etl_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
