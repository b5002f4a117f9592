import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from statefulstreamprocessor_spark.session import get_spark

    s = get_spark("ssp-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
