"""Every oracle-backed query must match DuckDB at sf0.001 (driver rehearsal)."""

from __future__ import annotations

import pytest

from etl_cotrip_signs_spark import registry

from .conftest import SF_ORACLE
from .oracle_compare import compare, run_oracle

registry.load_all()


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_oracle_parity(spark, name):
    spark_df = registry.QUERIES[name](spark, SF_ORACLE)
    oracle_pdf = run_oracle(registry.ORACLES[name], SF_ORACLE)
    problems = compare(spark_df, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(registry.QUERIES) - set(registry.ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = registry.QUERIES[name](spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
