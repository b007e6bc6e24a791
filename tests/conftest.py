from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from anofox_forecast_spark.session import get_spark

    s = get_spark("anofox-tests", cpus=4, shuffle_partitions=4)
    yield s
