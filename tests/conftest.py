import pytest

from ctcityscraper_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="ctcityscraper_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s


@pytest.fixture()
def tmp_store(spark, tmp_path):
    from ctcityscraper_spark.sources.store import ParquetStore

    return ParquetStore(spark, tmp_path, "newhaven")
