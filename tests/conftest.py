from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyrdfa3_spark.session import build_session

    s = build_session(master="local[4]", app_name="pyrdfa3_spark-tests",
                      shuffle_partitions=8,
                      max_partition_bytes=8 << 20)
    yield s
    s.stop()
