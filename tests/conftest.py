from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shuttle_spark import get_session  # noqa: E402

SMOKE_SF = "/root/testdata/sf0.001"
ORACLE_SF = os.environ.get("SHUTTLE_TEST_SF_DIR", SMOKE_SF)


@pytest.fixture(scope="session")
def spark():
    s = get_session("shuttle-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return ORACLE_SF
