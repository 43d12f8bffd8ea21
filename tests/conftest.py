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


@pytest.fixture(params=["file", "http"])
def any_repo(request, spark):
    """Storage-matrix fixture (reference `tests/conftest.py:29-41`): the
    same engine suite runs over the local backend and over a live HTTP
    repo server (HttpFS + read-through CacheFS)."""
    import contextlib

    from lakota_spark.repo import Repo

    root = tempfile.mkdtemp(prefix="lakota-spark-test-")
    with contextlib.ExitStack() as stack:
        if request.param == "http":
            from lakota_spark.server import serve

            url = stack.enter_context(serve(root))
            yield Repo(url, spark)
        else:
            yield Repo(root, spark)
    shutil.rmtree(root, ignore_errors=True)
