import pytest


@pytest.fixture(scope="session")
def spark():
    from hyper_storage_spark.session import get_spark

    s = get_spark("hyper_storage_spark_tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    import os

    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
