from __future__ import annotations

import pytest

from osprey_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="osprey_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/osprey_spark_wh"},
    )
    yield s
    s.stop()
