from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_datalake_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[8]", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def spark_global():
    # function-scoped hypothesis tests need a session-scoped handle
    # under a different name (hypothesis forbids function-scoped
    # fixtures but allows session-scoped ones)
    return get_spark("tests", master="local[8]", extra_conf={"spark.sql.shuffle.partitions": "8"})
