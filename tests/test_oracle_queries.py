"""Cross-check EVERY registry query against its DuckDB oracle at sf0.01 —
the same gate the driver applies (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from mapreduce_implementation_spark.registry import all_specs
from tests._oracle import compare, duck_connect
from tests.conftest import SF_DIR_01

_SPECS = all_specs()
_WITH_ORACLE = sorted(n for n, s in _SPECS.items() if s.oracle)
_ROWS_ONLY = sorted(n for n, s in _SPECS.items() if not s.oracle)


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_DIR_01)
    yield con
    con.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_match(spark, duck, name):
    spec = _SPECS[name]
    df = spec.fn(spark, SF_DIR_01)
    compare(df, duck, spec.oracle)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, name):
    spec = _SPECS[name]
    df = spec.fn(spark, SF_DIR_01)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
