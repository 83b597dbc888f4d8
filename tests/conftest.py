from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from cdc_agents_data_stream_spark.session import get_spark

    s = get_spark("engine-tests", master="local[4]")
    yield s
    s.stop()
