from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from emdrive_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("emdrive-tests")
    yield s
    s.stop()
