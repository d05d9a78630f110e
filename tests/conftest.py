from __future__ import annotations

import pytest

from fuzzycat_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fuzzycat-spark-tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
