from __future__ import annotations

import pytest

from glamr_omics_pipelines_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]",
                  extra_confs={"spark.sql.shuffle.partitions": "4"})
    yield s
