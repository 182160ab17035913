import pytest

from cc_net_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cc_net_spark_tests", shuffle_partitions=8)
    yield s
