import pytest

from distributed_search_engine_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dse-tests", cores=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
