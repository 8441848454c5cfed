"""The t2 correctness gate, locally: every contract vs its DuckDB oracle.

Default SF is sf0.001 (fast smoke); set SHUTTLE_TEST_SF_DIR=/root/testdata/sf0.01
to run at the driver's gate scale.
"""

from __future__ import annotations

import pytest

from shuttle_spark.contracts import REGISTRY
from shuttle_spark.testing import compare, duckdb_views


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    return duckdb_views(sf_dir)


@pytest.mark.parametrize("name", list(REGISTRY))
def test_contract(name, spark, sf_dir, oracle_con):
    c = REGISTRY[name]
    df = c.build(spark, sf_dir)
    if c.oracle is None:
        # rows-only contract: must run and be schema-stable
        assert df.count() >= 0
        assert df.columns
        return
    msgs = compare(df, oracle_con, c.oracle)
    assert not msgs, f"{name}: " + "; ".join(msgs)
