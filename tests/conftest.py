from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# Resolve the vendored protobuf runtime BEFORE test collection (skipif
# predicates) and before any JVM starts (executor workers inherit
# PYTHONPATH) — enables the transformWithStateInPandas e2e drive.
from laser_hadoop_spark.session import ensure_vendored_protobuf  # noqa: E402

ensure_vendored_protobuf()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-corpus sweeps (minutes; still part of the default suite)"
    )


@pytest.fixture(scope="session")
def spark():
    from laser_hadoop_spark.session import get_spark

    s = get_spark("pytest", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
