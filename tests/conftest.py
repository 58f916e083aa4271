from __future__ import annotations

import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Python WORKERS must also import wsspark (cloudpickled UDF closures
# reference it by module): local-mode workers inherit the driver env, so
# pin the repo root on PYTHONPATH regardless of the pytest invocation cwd.
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)

from wsspark.session import get_session  # noqa: E402

TESTDATA_SF = os.environ.get("WSSPARK_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_session(
        app_name="wsspark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TESTDATA_SF
