"""JDBC source/sink (SURVEY.md §2.1 S5/S6; reference load_to_postgres.py).

The reference stages every dataframe into Postgres with
``to_sql(if_exists="replace")`` (S5, load_to_postgres.py:27,46,72,89,105)
and reads dimension maps back with SELECTs (S6, :61,67). The Spark
equivalents are thin: ``df.write.jdbc`` / ``spark.read.jdbc``.

Exercised end-to-end in-container against embedded Apache Derby (the
Derby jars ship with Spark itself): ``jdbc:derby:memory:`` gives a real
SQL warehouse with no server process — see queries/jdbc_queries.py for
the oracle-checked star-schema load roundtrip. On a real cluster, pass
e.g. ``url="jdbc:postgresql://host/db"`` with the driver on the executor
classpath.

Scale notes baked into the defaults:
- reads partition on a numeric column (``partitionColumn`` + bounds) so the
  scan fans out across executors instead of a single JDBC cursor;
- writes use ``batchsize`` to amortize round trips; staging-table + MERGE
  beats row-level upserts at volume (SURVEY §2.1 S7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_jdbc_replace(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    batchsize: int = 10_000,
    column_types: str | None = None,
) -> None:
    """S5: full-replace staging write (``to_sql(if_exists="replace")``).

    ``column_types`` overrides the dialect's DDL type per column (e.g.
    ``"region_name VARCHAR(64)"``) — some dialects map StringType to a LOB
    type that disallows indexes/comparisons warehouse-side."""
    writer = df.write.mode("overwrite").option("batchsize", batchsize)
    if column_types:
        writer = writer.option("createTableColumnTypes", column_types)
    writer.jdbc(url, table, properties=properties or {})


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """S6: table scan; pass ``partition_column`` + bounds for a parallel
    read (unpartitioned JDBC reads run on ONE task — never do that for a
    fact table)."""
    reader = spark.read
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions)
        )
    return reader.jdbc(url, table, properties=properties or {})


def upsert_sql(
    dialect: str, table: str, staging: str, key_cols: list[str],
    update_cols: list[str],
) -> str:
    """Warehouse-side upsert statement: staged rows merge into ``table``
    keyed on ``key_cols`` (reference pattern: stage with to_sql, then one
    set-based statement — load_to_postgres.py:73-117).

    - ``postgresql``: literal reference parity — ``INSERT ... SELECT ...
      ON CONFLICT (keys) DO UPDATE SET col = EXCLUDED.col``.
    - ``derby`` (and ANSI fallback): ``MERGE INTO`` — Derby has no ON
      CONFLICT; MERGE is the standard form of the same set-based upsert.

    One statement either way: the upsert runs AS SQL IN THE WAREHOUSE over
    the staged table, never row-at-a-time from the client — the only shape
    that survives volume (SURVEY §2.1 S7).
    """
    cols = key_cols + update_cols
    col_list = ", ".join(cols)
    if dialect == "postgresql":
        keys = ", ".join(key_cols)
        sets = ", ".join(f"{c} = EXCLUDED.{c}" for c in update_cols)
        return (
            f"INSERT INTO {table} ({col_list}) "
            f"SELECT {col_list} FROM {staging} "
            f"ON CONFLICT ({keys}) DO UPDATE SET {sets}"
        )
    # Spark's JDBC writer passes TABLE names through unquoted (Derby folds
    # them to uppercase) but creates COLUMNS quoted case-exact — mirror
    # that split here or the MERGE resolves against the wrong identifiers
    q = '"{}"'.format
    on = " AND ".join(f"t.{q(c)} = s.{q(c)}" for c in key_cols)
    sets = ", ".join(f"t.{q(c)} = s.{q(c)}" for c in update_cols)
    qcol_list = ", ".join(q(c) for c in cols)
    ins_vals = ", ".join(f"s.{q(c)}" for c in cols)
    return (
        f"MERGE INTO {table} t USING {staging} s ON ({on}) "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({qcol_list}) VALUES ({ins_vals})"
    )


def insert_missing_sql(
    dialect: str,
    table: str,
    staging: str,
    key_cols: list[str],
    null_check_col: str | None = None,
    target_alias: str = "d",
) -> str:
    """Dimension-side insert-if-missing statement (SURVEY §2.1 S8): staged
    candidate rows LEFT JOIN the dimension on the natural key and only the
    unmatched ones insert — the reference's ``upsert_dim_table`` /
    ``upsert_dim_time`` shape (load_to_postgres.py:19-57), which never
    updates existing dimension rows (surrogate ids stay stable).

    ``null_check_col`` is the column whose NULL-ness proves no match —
    the reference checks the natural key for 1-col dims and the surrogate
    ``time_id`` for dim_time; defaults to the first key column.
    Identifier quoting follows the same split as :func:`upsert_sql` for
    the Derby/ANSI branch; Postgres gets the reference's bare identifiers.
    """
    null_col = null_check_col or key_cols[0]
    a = target_alias
    if dialect == "postgresql":
        col_list = ", ".join(key_cols)
        sel = ", ".join(f"s.{c}" for c in key_cols)
        on = " AND ".join(f"{a}.{c} = s.{c}" for c in key_cols)
        return (
            f"INSERT INTO {table} ({col_list}) "
            f"SELECT {sel} FROM {staging} s "
            f"LEFT JOIN {table} {a} ON {on} "
            f"WHERE {a}.{null_col} IS NULL"
        )
    q = '"{}"'.format
    col_list = ", ".join(q(c) for c in key_cols)
    sel = ", ".join(f"s.{q(c)}" for c in key_cols)
    on = " AND ".join(f"{a}.{q(c)} = s.{q(c)}" for c in key_cols)
    return (
        f"INSERT INTO {table} ({col_list}) "
        f"SELECT {sel} FROM {staging} s "
        f"LEFT JOIN {table} {a} ON {on} "
        f"WHERE {a}.{q(null_col)} IS NULL"
    )


def upsert_via_jdbc(
    spark: SparkSession,
    df: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    update_cols: list[str],
    properties: dict[str, str] | None = None,
    staging_suffix: str = "_stg",
) -> None:
    """S7 against a real SQL warehouse: distributed staging write (the
    executors fan the rows in over JDBC batches), then ONE driver-side
    set-based upsert statement, then drop the staging table — exactly the
    reference's stage-then-ON-CONFLICT shape (load_to_postgres.py:73-117),
    dialect-selected from the URL (``jdbc:postgresql:`` vs ``jdbc:derby:``).

    The driver-side statement is a metadata-sized operation: all row
    volume moved in the parallel staging write; only SQL text crosses the
    driver connection. Exercised end-to-end against embedded Derby in
    tests/test_jdbc.py; against Postgres the generated statement is the
    reference's own, byte-comparable (unit-pinned)."""
    staging = f"{table}{staging_suffix}"
    write_jdbc_replace(df, url, staging, properties=properties)
    dialect = "postgresql" if url.startswith("jdbc:postgresql") else "derby"
    stmt = upsert_sql(dialect, table, staging, key_cols, update_cols)
    jvm = spark._sc._jvm  # driver-side JDBC: same classpath as the writers
    props = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        st = conn.createStatement()
        st.executeUpdate(stmt)
        st.execute(f"DROP TABLE {staging}")
        st.close()
    finally:
        conn.close()


def transactional_upsert_many(
    spark: SparkSession,
    loads: list[tuple[DataFrame, str, list[str], list[str]]],
    url: str,
    properties: dict[str, str] | None = None,
    staging_suffix: str = "_stg",
) -> None:
    """Cross-table TRANSACTIONAL load: every (df, table, key_cols,
    update_cols) in ``loads`` upserts inside ONE warehouse transaction —
    all tables commit together or none do, the reference's
    ``engine.begin()`` envelope around dims+facts (load_to_postgres.py:128)
    that a per-table loop cannot reproduce.

    Shape: the row volume still moves in per-table PARALLEL staging writes
    (their own implicit transactions — staging tables are scratch, partial
    staging is harmless and re-runnable); only the set-based merge
    statements run on the single driver connection with autocommit off.
    On any failure the whole warehouse transaction rolls back and the
    target tables are untouched (pinned in tests/test_jdbc.py)."""
    staged = []
    for df, table, key_cols, update_cols in loads:
        staging = f"{table}{staging_suffix}"
        write_jdbc_replace(df, url, staging, properties=properties)
        staged.append((table, staging, key_cols, update_cols))
    dialect = "postgresql" if url.startswith("jdbc:postgresql") else "derby"
    jvm = spark._sc._jvm
    props = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        conn.setAutoCommit(False)
        st = conn.createStatement()
        try:
            for table, staging, key_cols, update_cols in staged:
                st.executeUpdate(
                    upsert_sql(dialect, table, staging, key_cols, update_cols)
                )
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            st.close()
        # staging cleanup is outside the transaction: Derby DDL inside a
        # rolled-back txn would resurrect the staging tables anyway, and
        # scratch tables are harmless to leave on failure
        st2 = conn.createStatement()
        for _, staging, _, _ in staged:
            try:
                st2.execute(f"DROP TABLE {staging}")
            except Exception:
                pass
        st2.close()
        conn.commit()
    finally:
        conn.close()
