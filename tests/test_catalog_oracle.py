"""The main correctness gate, run locally: every catalog query vs its DuckDB
oracle at sf0.001 (fast) — mirrors the driver's t2 check at sf0.01."""

from __future__ import annotations

import pytest

from etl_cascalog_spark.catalog import QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare, duckdb_con


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    spec = QUERIES[name]
    df = spec.build(spark, SF_SMOKE)
    if spec.oracle is None:
        assert df.count() >= 0
        return
    compare(df, con, spec.oracle)
