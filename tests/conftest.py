from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from etl_cotrip_signs_spark.session import get_spark

    s = get_spark("etl-cotrip-signs-tests")
    yield s
    s.stop()
