import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from azuresearchcrawlervector_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small + fast for unit tests
    s = get_spark("tests", shuffle_partitions=4)
    yield s


@pytest.fixture()
def tmp_ckpt(tmp_path):
    return str(tmp_path / "ckpt")
