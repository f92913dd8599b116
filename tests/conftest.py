from __future__ import annotations

import pytest

from vector_db_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("vector_db_spark-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
