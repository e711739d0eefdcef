import os

import pytest

from cdm_cbioportal_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s
