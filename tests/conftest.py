from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from fastetl_spark.session import get_spark

    # Pin the TEST session to local[8] (r15): at fixture scale the
    # suite is task-dispatch bound, and 8 cores measure ~7-12% faster
    # per file than local[32] on this box — the same overhead regime
    # the driver's own 8-core bench control shows at sf0.1. The bench
    # keeps local[$SPARK_GRAFT_CPUS]; only the tests pin.
    spark = get_spark(
        "fastetl-spark-tests", master="local[8]", shuffle_partitions=8
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
