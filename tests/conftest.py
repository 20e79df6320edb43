from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from kafka_streams_the_clojure_way_spark import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    session = get_spark("kstcw-tests", shuffle_partitions=4)
    yield session


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
