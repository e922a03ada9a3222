import pytest

from carbon_clickhouse_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ccs-tests", master="local[4]", shuffle_partitions=8)
    yield s
