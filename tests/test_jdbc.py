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


def _norm(sql: str) -> str:
    return " ".join(sql.split()).rstrip(";")


def test_upsert_sql_postgres_pins_all_three_reference_facts():
    """Byte-parity (modulo whitespace) with every fact statement the
    reference issues: load_to_postgres.py:72-86 (fact_energy_monthly),
    :89-101 (fact_emissions_monthly), :105-117 (fact_carbon_intensity)."""
    from energy_emissions_lakehouse_spark.sources.jdbc import upsert_sql

    cases = [
        (
            ("fact_energy_monthly", "stg_fact_energy",
             ["region_id", "source_id", "time_id"],
             ["avg_consumption_mwh", "max_consumption_mwh",
              "avg_temp_c", "records"]),
            """INSERT INTO fact_energy_monthly
               (region_id, source_id, time_id, avg_consumption_mwh, max_consumption_mwh, avg_temp_c, records)
               SELECT region_id, source_id, time_id, avg_consumption_mwh, max_consumption_mwh, avg_temp_c, records
               FROM stg_fact_energy
               ON CONFLICT (region_id, source_id, time_id)
               DO UPDATE SET
                   avg_consumption_mwh = EXCLUDED.avg_consumption_mwh,
                   max_consumption_mwh = EXCLUDED.max_consumption_mwh,
                   avg_temp_c = EXCLUDED.avg_temp_c,
                   records = EXCLUDED.records;""",
        ),
        (
            ("fact_emissions_monthly", "stg_fact_emissions",
             ["region_id", "sector_id", "time_id"],
             ["avg_co2_tonnes", "total_co2_tonnes", "records"]),
            """INSERT INTO fact_emissions_monthly
               (region_id, sector_id, time_id, avg_co2_tonnes, total_co2_tonnes, records)
               SELECT region_id, sector_id, time_id, avg_co2_tonnes, total_co2_tonnes, records
               FROM stg_fact_emissions
               ON CONFLICT (region_id, sector_id, time_id)
               DO UPDATE SET
                   avg_co2_tonnes = EXCLUDED.avg_co2_tonnes,
                   total_co2_tonnes = EXCLUDED.total_co2_tonnes,
                   records = EXCLUDED.records;""",
        ),
        (
            ("fact_carbon_intensity", "stg_fact_intensity",
             ["region_id", "time_id"],
             ["total_energy_mwh", "total_co2_tonnes", "co2_per_mwh"]),
            """INSERT INTO fact_carbon_intensity
               (region_id, time_id, total_energy_mwh, total_co2_tonnes, co2_per_mwh)
               SELECT region_id, time_id, total_energy_mwh, total_co2_tonnes, co2_per_mwh
               FROM stg_fact_intensity
               ON CONFLICT (region_id, time_id)
               DO UPDATE SET
                   total_energy_mwh = EXCLUDED.total_energy_mwh,
                   total_co2_tonnes = EXCLUDED.total_co2_tonnes,
                   co2_per_mwh = EXCLUDED.co2_per_mwh;""",
        ),
    ]
    for (table, stg, keys, updates), reference_stmt in cases:
        got = upsert_sql("postgresql", table, stg, keys, updates)
        assert _norm(got) == _norm(reference_stmt), table


def test_insert_missing_sql_postgres_pins_both_reference_dims():
    """Dimension insert-if-missing parity: the generic name-keyed dim
    (load_to_postgres.py:19-37, e.g. dim_region) and the composite-key
    dim_time whose no-match proof is the surrogate time_id (:40-57)."""
    from energy_emissions_lakehouse_spark.sources.jdbc import insert_missing_sql

    got = insert_missing_sql(
        "postgresql", "dim_region", "stg_dim_region", ["region_name"]
    )
    assert _norm(got) == _norm(
        """INSERT INTO dim_region (region_name)
           SELECT s.region_name
           FROM stg_dim_region s
           LEFT JOIN dim_region d ON d.region_name = s.region_name
           WHERE d.region_name IS NULL;"""
    )

    got = insert_missing_sql(
        "postgresql", "dim_time", "stg_dim_time", ["year", "month"],
        null_check_col="time_id", target_alias="t",
    )
    assert _norm(got) == _norm(
        """INSERT INTO dim_time (year, month)
           SELECT s.year, s.month
           FROM stg_dim_time s
           LEFT JOIN dim_time t ON t.year = s.year AND t.month = s.month
           WHERE t.time_id IS NULL;"""
    )


def test_insert_missing_sql_derby_executes(spark):
    """The Derby/ANSI branch of insert_missing_sql runs for real: only
    unmatched keys insert, existing rows never change, reruns are no-ops."""
    from energy_emissions_lakehouse_spark.sources.jdbc import (
        insert_missing_sql,
        read_jdbc,
        write_jdbc_replace,
    )

    url = "jdbc:derby:memory:eel_insmiss;create=true"
    # BIGINT key: Spark's JDBC writer maps STRING to Derby CLOB, which is
    # not join-comparable — the PG dialect (reference target) has no such
    # limit, so the Derby execution check uses a numeric natural key
    write_jdbc_replace(
        spark.createDataFrame([(1,)], "k BIGINT"),
        url, "dim_x", DERBY_PROPS,
    )
    write_jdbc_replace(
        spark.createDataFrame([(1,), (2,)], "k BIGINT"),
        url, "dim_x_stg", DERBY_PROPS,
    )
    stmt = insert_missing_sql("derby", "dim_x", "dim_x_stg", ["k"])
    jvm = spark._sc._jvm
    props = jvm.java.util.Properties()
    for k, v in DERBY_PROPS.items():
        props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        st = conn.createStatement()
        for _ in range(2):  # second run inserts nothing
            st.executeUpdate(stmt)
        st.close()
    finally:
        conn.close()
    got = sorted(r[0] for r in read_jdbc(spark, url, "dim_x", DERBY_PROPS).collect())
    assert got == [1, 2]


def test_postgres_dialect_type_mappings_golden(spark):
    """Golden pin of the DDL types the PG branch would create (round-12
    advice: the literal reference-parity path must not be dead code; no
    PG server exists in this sandbox, so the pin drives Spark's OWN
    PostgresDialect — the exact code path write_jdbc_replace takes for a
    jdbc:postgresql URL — and records the type DDL it would emit).
    The reference's to_sql(if_exists='replace') relies on these same
    server-side types (load_to_postgres.py:27,46,72)."""
    jvm = spark._sc._jvm
    dialect = jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(
        "jdbc:postgresql://host/db"
    )
    assert "PostgresDialect" in dialect.toString()
    DT = jvm.org.apache.spark.sql.types.DataTypes
    JdbcUtils = jvm.org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils

    def ddl_type(name: str) -> str:
        dt = getattr(DT, name)
        opt = dialect.getJDBCType(dt)
        if not opt.isDefined():
            # dialect passes through: Spark falls back to the common
            # JDBC mapping (JdbcUtils.getJdbcType does exactly this)
            opt = JdbcUtils.getCommonJDBCType(dt)
        s = opt.get().toString()  # JdbcType(<ddl>,<jdbc const>)
        return s[len("JdbcType("):].rsplit(",", 1)[0]

    golden = {
        # PostgresDialect overrides (the reference's column types)
        "StringType": "TEXT",
        "BinaryType": "BYTEA",
        "BooleanType": "BOOLEAN",
        "FloatType": "FLOAT4",
        "DoubleType": "FLOAT8",
        "ByteType": "SMALLINT",
        # common fallbacks the dialect passes through
        "IntegerType": "INTEGER",
        "LongType": "BIGINT",
        "ShortType": "SMALLINT",
        # Spark's TimestampType is session-TZ-relative: the PG dialect
        # maps it to timestamptz (TimestampNTZ would be plain TIMESTAMP)
        "TimestampType": "TIMESTAMP WITH TIME ZONE",
        "DateType": "DATE",
    }
    got = {name: ddl_type(name) for name in golden}
    assert got == golden
    # identifier quoting: PG double-quotes case-exact — the reason
    # upsert_sql's PG branch can use bare lowercase identifiers while
    # the Derby branch must quote (Spark creates columns quoted)
    assert dialect.quoteIdentifier("MiXed") == '"MiXed"'


def test_postgres_dialect_selected_from_url():
    """upsert_via_jdbc / transactional_upsert_many pick the dialect from
    the URL scheme: a postgres URL must generate the ON CONFLICT text,
    never the MERGE fallback."""
    from energy_emissions_lakehouse_spark.sources.jdbc import upsert_sql

    url = "jdbc:postgresql://host/db"
    dialect = "postgresql" if url.startswith("jdbc:postgresql") else "derby"
    stmt = upsert_sql(dialect, "t", "t_stg", ["k"], ["v"])
    assert "ON CONFLICT (k) DO UPDATE SET v = EXCLUDED.v" in stmt
    assert "MERGE" not in stmt
