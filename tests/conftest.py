import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from tableextraction_spark.session import get_spark

    s = get_spark(
        app="tests",
        master="local[4]",
        shuffle_partitions=4,
        driver_memory="4g",
        # keep catalog-table tests from writing ./spark-warehouse in the repo
        warehouse_dir=tempfile.mkdtemp(prefix="tablex-warehouse-"),
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
