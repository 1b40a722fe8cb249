"""Every oracle-backed query must match DuckDB at sf0.001 (driver rehearsal)."""

from __future__ import annotations

import pytest

from etl_cotrip_signs_spark import registry

from .conftest import SF_ORACLE
from .oracle_compare import compare, run_oracle

registry.load_all()


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_oracle_parity(spark, name):
    # building the Spark side first also stages the scratch files that
    # {SCRATCH:tag}-templated oracles read (those queries write eagerly
    # inside the call); oracle_for renders templates for THIS sf —
    # registry.ORACLES is pre-rendered for the driver's sf0.01
    spark_df = registry.QUERIES[name](spark, SF_ORACLE)
    oracle_pdf = run_oracle(registry.oracle_for(name, SF_ORACLE), SF_ORACLE)
    problems = compare(spark_df, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(registry.QUERIES) - set(registry.ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = registry.QUERIES[name](spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
