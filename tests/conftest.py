from __future__ import annotations

import pytest

from crawl4ai_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir(spark, tmp_path_factory):
    """Small deterministic web-graph fixture shared across tests."""
    from crawl4ai_spark.fixtures import write_fixtures

    d = tmp_path_factory.mktemp("fixtures")
    write_fixtures(spark, str(d), n_docs=300, n_hosts=12)
    return str(d)
