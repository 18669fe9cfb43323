import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patterns_devkit_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    return get_spark("tests", shuffle_partitions=8)


@pytest.fixture()
def engine(spark, tmp_path):
    from patterns_devkit_spark import Engine

    return Engine(str(tmp_path / "wh"), spark=spark)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
