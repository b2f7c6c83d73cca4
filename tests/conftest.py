from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from content_analytics_etl_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
# The mid-size driver corpus, for tests whose operating point is
# vacuous on the 20-vector/60-doc smoke tables (e.g. LSH near-dup).
SF_SMALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf001_dir() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf01_dir() -> str:
    # Large enough (2000 vectors) that the two-level quantizer's
    # super-cell pruning is real (s > CLUS_SUPER_PROBE).
    return "/root/testdata/sf0.1"
