from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from lucene_solr_intervals_spark.session import get_spark

    s = get_spark(
        app_name="lsi-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()
