import pytest

from data_migration_service_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dms-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
