import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from coinbase_data_pipeline_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=8)
    yield s
