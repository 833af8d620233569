import pytest


@pytest.fixture(scope="session")
def spark():
    from kafka_connect_jdbc_flatten_spark.session import get_spark

    s = get_spark("tests", cores=4, shuffle_partitions=4)
    yield s
