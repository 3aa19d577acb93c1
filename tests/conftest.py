import sys

import pytest

sys.path.insert(0, "/root/repo")

from persistor_spark.session import build_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = build_session("persistor-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def ingested(spark, sf_dir):
    """One shared fixture ingest (cached) for read-only assertions."""
    from persistor_spark import fixtures

    result = fixtures.run_fixture_ingest(spark, sf_dir)
    result.index_metadata = result.index_metadata.cache()
    result.blob_records = result.blob_records.cache()
    result.deadletter = result.deadletter.cache()
    return result
