import shutil
import tempfile

import pytest

from lakota_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("lakota-spark-tests", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture()
def repo(spark):
    from lakota_spark.repo import Repo

    root = tempfile.mkdtemp(prefix="lakota-spark-test-")
    yield Repo(root, spark)
    shutil.rmtree(root, ignore_errors=True)
