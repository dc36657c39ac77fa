import pytest


@pytest.fixture(scope="session")
def spark():
    from ontonotes_5_parsing_spark.session import get_spark

    s = get_spark(app_name="pytest", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
