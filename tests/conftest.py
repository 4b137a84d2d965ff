import pytest

from rabbit_index_ingest_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
