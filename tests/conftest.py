import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    from credit_ocr_system_spark.session import build_session

    spark = build_session(app_name="cos-tests", master="local[4]",
                          shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    # sf0.001 keeps the suite fast; COS_TEST_SF=sf0.01 re-runs the
    # oracle-parity gate at the driver's verification scale.
    return os.path.join(TESTDATA, os.environ.get("COS_TEST_SF", "sf0.001"))
