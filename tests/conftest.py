from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from codingchallenge_spark.session import build_session  # noqa: E402
from fixtures.gen_repo_files import generate  # noqa: E402

TESTDATA = "/root/testdata"


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="ccspark-tests", master="local[4]", shuffle_partitions=8
    )
    s.sparkContext.setLogLevel("WARN")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_fixture():
    return generate(200)


@pytest.fixture(scope="session")
def small_fixture():
    return generate(5000)


@pytest.fixture(scope="session")
def tiny_records(spark, tiny_fixture):
    return spark.createDataFrame(tiny_fixture.records)


@pytest.fixture(scope="session")
def small_records(spark, small_fixture):
    return spark.createDataFrame(small_fixture.records)
