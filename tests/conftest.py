from __future__ import annotations

import pytest

from osm2orc_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="osm2orc_spark-tests")
    yield s


SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correctness() -> str:
    return SF_CORRECTNESS
