import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from redeye_spark.session import get_spark

    s = get_spark(
        "redeye-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false", "spark.sql.execution.arrow.maxRecordsPerBatch": "1000"},
    )
    yield s
