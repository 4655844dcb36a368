import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"
TESTDATA = os.path.join(REFERENCE, "testdata")


@pytest.fixture(scope="session")
def spark():
    from feldman_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark(app_name="feldman-spark-tests", master="local[4]",
                      shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def ref_testdata():
    if not os.path.isdir(TESTDATA):
        pytest.skip("reference testdata not available")
    return TESTDATA


@pytest.fixture(scope="session")
def tmp_out():
    out = "/root/repo/.tmp/testout"
    os.makedirs(out, exist_ok=True)
    return out


@pytest.fixture(scope="session")
def spark_fuzz(spark):
    # alias so hypothesis-driven tests share the session fixture without
    # hypothesis complaining about function-scoped fixtures
    return spark
