"""JDBC warehouse load + readback (SURVEY.md §2.1 S5/S6).

The reference's entire load stage is JDBC: every gold mart and dim is staged
into Postgres with ``to_sql(if_exists="replace")`` and dimension maps are
read back with SELECTs (src/30_load/load_to_postgres.py:27,46,61,67). This
module runs the same contract against embedded Apache Derby
(``jdbc:derby:memory:`` — in-process, no server), whose jars ship with
Spark. The engine code is identical to what a Postgres deployment would run;
only the URL/driver differ.

Scale shape: dims are written unpartitioned (tiny by definition); the fact
readback is a *partitioned* JDBC scan (partitionColumn + bounds) so on a
real warehouse the scan fans out across executors instead of one cursor.
The final re-key join broadcasts the JDBC-read dims — same plan as the
parquet star join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from energy_emissions_lakehouse_spark.medallion.sql_oracle import with_pipeline
from energy_emissions_lakehouse_spark.medallion.staging import layer
from energy_emissions_lakehouse_spark.registry import register
from energy_emissions_lakehouse_spark.sources.jdbc import (
    read_jdbc,
    write_jdbc_replace,
)

DERBY_URL = "jdbc:derby:memory:eel_warehouse;create=true"
DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def load_star_to_derby(spark: SparkSession, url: str = DERBY_URL) -> None:
    """Stage the carbon-intensity star slice into the Derby warehouse —
    the reference's load_to_postgres flow (dims first, then facts), with
    ``mode("overwrite")`` supplying the ``if_exists="replace"`` semantics
    that make the load idempotent (load_to_postgres.py:13 design goal)."""
    write_jdbc_replace(
        layer(spark, "dim_region"),
        url,
        "dim_region",
        DERBY_PROPS,
        # Derby's dialect maps StringType -> CLOB, which cannot be compared
        # or indexed warehouse-side; pin a real VARCHAR like the reference
        # DDL's TEXT (SQL/01_create_schema.sql:4).
        column_types="region_name VARCHAR(64)",
    )
    write_jdbc_replace(layer(spark, "dim_time"), url, "dim_time", DERBY_PROPS)
    write_jdbc_replace(
        layer(spark, "fact_carbon_intensity"),
        url,
        "fact_carbon_intensity",
        DERBY_PROPS,
    )


@register(
    "jdbc_star_roundtrip_q2",
    oracle=with_pipeline(
        """
    SELECT r.region_name, t.year, t.month,
           f.total_energy_mwh, f.total_co2_tonnes, f.co2_per_mwh
    FROM fact_carbon_intensity f
    JOIN dim_region r ON r.region_id = f.region_id
    JOIN dim_time t ON t.time_id = f.time_id
    """
    ),
    survey="S5 S6 J4 — full JDBC warehouse roundtrip: star slice written to "
    "embedded Derby (write_jdbc_replace = to_sql(if_exists='replace'), "
    "load_to_postgres.py:27,46), facts read back as a PARTITIONED jdbc scan "
    "(:61,67), dims broadcast, q2 re-derived warehouse-side — result must "
    "be value-identical to the parquet-direct pipeline oracle",
)
def jdbc_star_roundtrip_q2(spark, sf_dir) -> DataFrame:
    """Write star slice -> Derby -> read back -> analysis q2. Every value
    (ids, year/month, doubles incl. the nullable co2_per_mwh) must survive
    the JDBC boundary bit-exact."""
    load_star_to_derby(spark)
    dim_region = read_jdbc(spark, DERBY_URL, "dim_region", DERBY_PROPS)
    dim_time = read_jdbc(spark, DERBY_URL, "dim_time", DERBY_PROPS)
    # 24 distinct time_ids -> 4 range partitions; the fan-out pattern a
    # real fact-table readback needs (one JDBC cursor per partition).
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
    return (
        fact.join(F.broadcast(dim_region), "region_id")
        .join(F.broadcast(dim_time), "time_id")
        .select(
            "region_name",
            "year",
            "month",
            "total_energy_mwh",
            "total_co2_tonnes",
            "co2_per_mwh",
        )
    )


TXN_URL = "jdbc:derby:memory:eel_txn_star;create=true"


@register(
    "jdbc_txn_upsert_roundtrip",
    oracle=with_pipeline(
        """
    SELECT r.region_name, t.year, t.month, f.co2_per_mwh
    FROM fact_carbon_intensity f
    JOIN dim_region r ON r.region_id = f.region_id
    JOIN dim_time t ON t.time_id = f.time_id
    """
    ),
    survey="S5 S6 S7 + cross-table transactional load — the reference's "
    "engine.begin() envelope (load_to_postgres.py:128): a stale warehouse "
    "(first-year facts zeroed, one dim renamed) is repaired by ONE "
    "transaction upserting dim_region AND fact_carbon_intensity together "
    "via staged set-based merges (sources/jdbc.transactional_upsert_many; "
    "Postgres dialect emits the reference's literal ON CONFLICT form). "
    "The readback must equal the parquet-direct pipeline exactly — "
    "updates applied, missing months inserted, nothing partially "
    "committed; atomicity itself is pinned in tests/test_jdbc.py",
)
def jdbc_txn_upsert_roundtrip(spark, sf_dir) -> DataFrame:
    """Stale-warehouse repair through one cross-table transaction, then a
    joined readback (region_name, year, month, co2_per_mwh)."""
    from energy_emissions_lakehouse_spark.sources.jdbc import (
        transactional_upsert_many,
    )

    fact = layer(spark, "fact_carbon_intensity")
    dims_r = layer(spark, "dim_region")
    dim_t = layer(spark, "dim_time")
    # stale warehouse: only the first 12 months, co2 zeroed; one dim wrong
    stale_fact = fact.filter(F.col("time_id") <= 12).withColumn(
        "co2_per_mwh", F.lit(0.0)
    )
    stale_dims = dims_r.withColumn(
        "region_name",
        F.when(F.col("region_id") == 1, F.lit("__stale__")).otherwise(
            F.col("region_name")
        ),
    )
    write_jdbc_replace(
        stale_dims, TXN_URL, "dim_region", DERBY_PROPS,
        column_types="region_name VARCHAR(64)",
    )
    write_jdbc_replace(dim_t, TXN_URL, "dim_time", DERBY_PROPS)
    write_jdbc_replace(stale_fact, TXN_URL, "fact_carbon_intensity", DERBY_PROPS)
    # one transaction repairs both tables together
    transactional_upsert_many(
        spark,
        [
            (dims_r, "dim_region", ["region_id"], ["region_name"]),
            (
                fact,
                "fact_carbon_intensity",
                ["region_id", "time_id"],
                ["total_energy_mwh", "total_co2_tonnes", "co2_per_mwh"],
            ),
        ],
        TXN_URL,
        properties=DERBY_PROPS,
    )
    f = read_jdbc(
        spark, TXN_URL, "fact_carbon_intensity", DERBY_PROPS,
        partition_column="time_id", lower_bound=1, upper_bound=25,
        num_partitions=4,
    )
    r = read_jdbc(spark, TXN_URL, "dim_region", DERBY_PROPS)
    t_ = read_jdbc(spark, TXN_URL, "dim_time", DERBY_PROPS)
    return (
        f.join(F.broadcast(r), "region_id")
        .join(F.broadcast(t_), "time_id")
        .select("region_name", "year", "month", "co2_per_mwh")
    )
