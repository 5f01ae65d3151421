"""Every registered query with an oracle must match DuckDB at the test
scale factor — the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from fp_data_lakehouse_spark.operators import REGISTRY

from .conftest import SF_ORACLE
from .oracle_util import assert_matches_oracle

_WITH_ORACLE = sorted(name for name, spec in REGISTRY.items() if spec.oracle)
_WITHOUT_ORACLE = sorted(name for name, spec in REGISTRY.items() if not spec.oracle)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    df = spec.builder(spark, SF_ORACLE)
    assert_matches_oracle(df, duck, spec.oracle, name=name)


@pytest.mark.parametrize("name", _WITHOUT_ORACLE)
def test_query_runs_without_oracle(spark, name):
    spec = REGISTRY[name]
    df = spec.builder(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    out = e.entry(spark)
    rows = out.collect()
    assert len(rows) == 10
    assert out.columns == ["c_custkey", "c_name", "avg_item_value"]


def test_registry_contract():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 29
