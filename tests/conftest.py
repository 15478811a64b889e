import os
import sys
from pathlib import Path

import pytest

from ctcityscraper_spark.session import get_spark

# Python workers (mapInPandas etc.) import test modules by name when
# cloudpickle serializes test-defined functions by reference — make the
# tests dir and repo root importable in workers before the JVM starts.
_TESTS_DIR = str(Path(__file__).resolve().parent)
_REPO_DIR = str(Path(__file__).resolve().parent.parent)
os.environ["PYTHONPATH"] = os.pathsep.join(
    [_TESTS_DIR, _REPO_DIR, os.environ.get("PYTHONPATH", "")]
)
sys.path.insert(0, _TESTS_DIR)


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
