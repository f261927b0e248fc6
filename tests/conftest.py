import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from vtcomposite_spark.schema import get_spark

    s = get_spark(app="vtcomposite-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


FIXTURES = "/root/reference/test/fixtures"


@pytest.fixture(scope="session")
def fixture_bytes():
    def load(name: str) -> bytes:
        with open(os.path.join(FIXTURES, name), "rb") as f:
            return f.read()

    if not os.path.isdir(FIXTURES):
        pytest.skip("reference fixtures not available")
    return load
