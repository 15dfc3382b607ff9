import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arekit_r335_spark.session import get_spark  # noqa: E402

DATA_001 = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy fixture-generating tests (deselect with "
        "-m 'not slow')")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="arekit-tests", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf0001_dir():
    # repo_data_dir respects DATA_VERSION (regenerates stale fixtures)
    from arekit_r335_spark.datagen import repo_data_dir
    return repo_data_dir("/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf001_dir():
    from arekit_r335_spark.datagen import repo_data_dir
    return repo_data_dir("/root/testdata/sf0.01")
