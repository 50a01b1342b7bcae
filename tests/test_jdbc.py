"""JDBC warehouse path (S5/S6) against embedded Derby.

The reference's load stage promises idempotence: running the loader twice
leaves the warehouse in the identical state (load_to_postgres.py:13, via
``to_sql(if_exists="replace")``). These tests prove our JDBC sink/source
pair delivers the same contract in-container, with no external DB.
"""

from __future__ import annotations

from energy_emissions_lakehouse_spark.queries.jdbc_queries import (
    DERBY_PROPS,
    DERBY_URL,
    load_star_to_derby,
)
from energy_emissions_lakehouse_spark.sources.jdbc import read_jdbc


def _snapshot(spark) -> dict[str, list]:
    out = {}
    for tbl in ("dim_region", "dim_time", "fact_carbon_intensity"):
        df = read_jdbc(spark, DERBY_URL, tbl, DERBY_PROPS)
        out[tbl] = sorted(map(tuple, df.collect()))
    return out


def test_derby_load_is_idempotent(spark):
    load_star_to_derby(spark)
    first = _snapshot(spark)
    load_star_to_derby(spark)
    second = _snapshot(spark)
    assert first == second
    assert len(first["dim_region"]) == 4
    assert len(first["dim_time"]) == 24
    assert len(first["fact_carbon_intensity"]) == 96


def test_partitioned_jdbc_read_fans_out(spark):
    """A bounded partitionColumn read must open one cursor per range
    partition — the difference between a parallel scan and a single-task
    bottleneck on a real fact table."""
    load_star_to_derby(spark)
    fact = read_jdbc(
        spark,
        DERBY_URL,
        "fact_carbon_intensity",
        DERBY_PROPS,
        partition_column="time_id",
        lower_bound=1,
        upper_bound=25,
        num_partitions=4,
    )
    assert fact.rdd.getNumPartitions() == 4
    assert fact.count() == 96
