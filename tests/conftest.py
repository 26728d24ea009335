from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from replicadb_spark.session import get_spark

    s = get_spark("replicadb-spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
