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


def test_upsert_sql_postgres_matches_reference_shape():
    """The generated Postgres statement must be the reference's own
    stage-then-ON-CONFLICT form (load_to_postgres.py:73-86)."""
    from energy_emissions_lakehouse_spark.sources.jdbc import upsert_sql

    stmt = upsert_sql(
        "postgresql",
        "fact_energy_monthly",
        "stg_fact_energy",
        ["region_id", "source_id", "time_id"],
        ["avg_consumption_mwh", "records"],
    )
    assert stmt == (
        "INSERT INTO fact_energy_monthly "
        "(region_id, source_id, time_id, avg_consumption_mwh, records) "
        "SELECT region_id, source_id, time_id, avg_consumption_mwh, records "
        "FROM stg_fact_energy "
        "ON CONFLICT (region_id, source_id, time_id) DO UPDATE SET "
        "avg_consumption_mwh = EXCLUDED.avg_consumption_mwh, "
        "records = EXCLUDED.records"
    )


def test_upsert_via_jdbc_derby_end_to_end(spark):
    """Stage + warehouse-side MERGE against embedded Derby: updates hit
    matched keys, inserts cover new keys, reruns are idempotent."""
    from energy_emissions_lakehouse_spark.sources.jdbc import (
        upsert_via_jdbc,
        write_jdbc_replace,
    )

    url = "jdbc:derby:memory:eel_upsert;create=true"
    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k BIGINT, v DOUBLE"
    )
    write_jdbc_replace(base, url, "tgt", DERBY_PROPS)
    delta = spark.createDataFrame(
        [(2, 99.0), (3, 30.0)], "k BIGINT, v DOUBLE"
    )
    for _ in range(2):  # idempotent on rerun
        upsert_via_jdbc(
            spark, delta, url, "tgt", ["k"], ["v"], properties=DERBY_PROPS
        )
        got = sorted(
            map(tuple, read_jdbc(spark, url, "tgt", DERBY_PROPS).collect())
        )
        assert got == [(1, 10.0), (2, 99.0), (3, 30.0)]


def test_transactional_upsert_all_or_nothing(spark):
    """The cross-table load must be atomic (reference engine.begin()
    envelope, load_to_postgres.py:128): if any table's merge fails, EVERY
    table is left untouched — including ones whose merge already ran."""
    import pytest

    from energy_emissions_lakehouse_spark.sources.jdbc import (
        read_jdbc,
        transactional_upsert_many,
        write_jdbc_replace,
    )

    url = "jdbc:derby:memory:eel_txn;create=true"
    a = spark.createDataFrame([(1, 10.0)], "k BIGINT, v DOUBLE")
    b = spark.createDataFrame([(1, 100.0)], "k BIGINT, v DOUBLE")
    write_jdbc_replace(a, url, "txn_a", DERBY_PROPS)
    write_jdbc_replace(b, url, "txn_b", DERBY_PROPS)

    da = spark.createDataFrame([(1, 11.0), (2, 12.0)], "k BIGINT, v DOUBLE")
    db = spark.createDataFrame([(2, 200.0)], "k BIGINT, v DOUBLE")

    # happy path: both tables move together
    transactional_upsert_many(
        spark, [(da, "txn_a", ["k"], ["v"]), (db, "txn_b", ["k"], ["v"])],
        url, properties=DERBY_PROPS,
    )
    got_a = sorted(map(tuple, read_jdbc(spark, url, "txn_a", DERBY_PROPS).collect()))
    got_b = sorted(map(tuple, read_jdbc(spark, url, "txn_b", DERBY_PROPS).collect()))
    assert got_a == [(1, 11.0), (2, 12.0)]
    assert got_b == [(1, 100.0), (2, 200.0)]

    # failure path: second merge targets a missing table -> the FIRST
    # table's already-executed merge must roll back too
    da2 = spark.createDataFrame([(1, 999.0)], "k BIGINT, v DOUBLE")
    with pytest.raises(Exception):
        transactional_upsert_many(
            spark,
            [(da2, "txn_a", ["k"], ["v"]),
             (da2, "txn_missing", ["k"], ["v"])],
            url, properties=DERBY_PROPS,
        )
    after = sorted(map(tuple, read_jdbc(spark, url, "txn_a", DERBY_PROPS).collect()))
    assert after == got_a, "partial commit leaked through the transaction"


def test_upsert_sql_derby_merge_shape():
    """The Derby/ANSI form must mirror Spark's JDBC writer identifier
    behavior: table names unquoted (Derby folds them to uppercase),
    column names quoted case-exact — the split that makes the MERGE
    resolve against tables as the writer actually created them."""
    from energy_emissions_lakehouse_spark.sources.jdbc import upsert_sql

    stmt = upsert_sql("derby", "tgt", "tgt_stg", ["k"], ["v"])
    assert stmt == (
        'MERGE INTO tgt t USING tgt_stg s ON (t."k" = s."k") '
        'WHEN MATCHED THEN UPDATE SET t."v" = s."v" '
        'WHEN NOT MATCHED THEN INSERT ("k", "v") VALUES (s."k", s."v")'
    )
