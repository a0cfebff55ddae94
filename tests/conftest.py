import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from ny_campaign_finance_dedupe_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("nycfd-tests", shuffle_partitions=8)
    yield s
    s.stop()
