"""Differential test: every registered query vs its DuckDB oracle.

This mirrors the driver's t2 correctness gate (row count + schema +
order-insensitive values) at sf0.001 so regressions surface in seconds.
"""

from __future__ import annotations

import pytest

from energy_emissions_lakehouse_spark.oracle import compare_query
from energy_emissions_lakehouse_spark.registry import all_specs


def _names() -> list[str]:
    return list(all_specs())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, oracle_con, sf_dir, name):
    result = compare_query(spark, oracle_con, name, sf_dir)
    assert result.ok, f"{name}: {result.detail}"
    assert result.spark_rows >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_contract_alignment():
    import __spark_entry__ as e

    queries = e.queries()
    oracle = e.oracle_sql()
    assert set(oracle) <= set(queries)
    assert len(queries) > 0
