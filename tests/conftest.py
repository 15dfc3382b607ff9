import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arekit_r335_spark.session import get_spark  # noqa: E402

DATA_001 = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="arekit-tests", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf0001_dir():
    from arekit_r335_spark.datagen import generate
    if not os.path.exists(os.path.join(DATA_001, "transcripts.parquet")):
        generate(DATA_001, 0.001)
    return DATA_001
