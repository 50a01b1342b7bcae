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
