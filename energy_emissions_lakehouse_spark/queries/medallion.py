"""Medallion pipeline parity queries — the reference-faithful surface.

Each entry runs the full bronze->silver->gold(->star) pipeline in Spark and
is checked against a DuckDB oracle that reproduces the *entire* pipeline in
one WITH chain (medallion/sql_oracle.py). Because the generator is
cross-engine deterministic, every layer is value-exact, not just
structurally similar — the strongest parity evidence the driver can record.

These queries ignore ``sf_dir``: the reference workload is fixed-size
(731 days x 4 regions x 4 sources / 3 sectors, SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from energy_emissions_lakehouse_spark.functions.exact import scaled_sum, scaled_sum_sql
from energy_emissions_lakehouse_spark.medallion import analysis as an
from energy_emissions_lakehouse_spark.medallion.sql_oracle import with_pipeline
from energy_emissions_lakehouse_spark.medallion.staging import layer
from energy_emissions_lakehouse_spark.registry import register

STAR_TABLES = (
    "dim_region",
    "dim_energy_source",
    "dim_sector",
    "dim_time",
    "fact_energy_monthly",
    "fact_emissions_monthly",
    "fact_carbon_intensity",
)


# Every layer resolves through medallion/staging.py: materialized ONCE to
# parquet (cross-process, fingerprint-keyed), then each query here is a
# plain scan over a tiny table — the same contract as the reference, which
# persists every layer between stages (bronze CSV -> silver parquet -> gold
# parquet -> warehouse). Round 1's per-session localCheckpoint memos made
# the first medallion query of each fresh session pay the full pipeline
# build, which is what truncated the driver's correctness sweep.


def _bronze(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    return layer(spark, "bronze_energy"), layer(spark, "bronze_emissions")


def _silver(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    return layer(spark, "silver_energy"), layer(spark, "silver_emissions")


def _gold(spark: SparkSession) -> tuple[DataFrame, DataFrame, DataFrame]:
    return (
        layer(spark, "gold_energy_monthly"),
        layer(spark, "gold_emissions_monthly"),
        layer(spark, "gold_carbon_intensity"),
    )


def _star(spark: SparkSession) -> dict[str, DataFrame]:
    return {name: layer(spark, name) for name in STAR_TABLES}


# ------------------------------------------------------------------ bronze


@register(
    "medallion_bronze_energy_profile",
    oracle=with_pipeline(
        f"""
    SELECT energy_source,
           COUNT(*) AS n_rows,
           COUNT(CASE WHEN consumption_mwh IS NULL THEN 1 END) AS n_null,
           COUNT(CASE WHEN consumption_mwh = 'N/A' THEN 1 END) AS n_na,
           {scaled_sum_sql('temperature_c')} AS sum_temp
    FROM bronze_energy GROUP BY energy_source
    """
    ),
    survey="S9 J7 P5 P6 P8 P9 R1 — deterministic dirty-data generator "
    "(generate_energy_emissions.py:39-124)",
)
def medallion_bronze_energy_profile(spark, sf_dir) -> DataFrame:
    return (
        _bronze(spark)[0]
        .groupBy("energy_source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("consumption_mwh").isNull(), 1)).alias("n_null"),
            F.count(F.when(F.col("consumption_mwh") == "N/A", 1)).alias("n_na"),
            scaled_sum(F.col("temperature_c")).alias("sum_temp"),
        )
    )


@register(
    "medallion_bronze_emissions_profile",
    oracle=with_pipeline(
        f"""
    SELECT sector,
           COUNT(*) AS n_rows,
           COUNT(CASE WHEN co2_tonnes IS NULL THEN 1 END) AS n_null,
           {scaled_sum_sql('co2_tonnes')} AS sum_co2
    FROM bronze_emissions GROUP BY sector
    """
    ),
    survey="S9 P8 — emissions generator with sector multipliers "
    "(generate_energy_emissions.py:80-96)",
)
def medallion_bronze_emissions_profile(spark, sf_dir) -> DataFrame:
    return (
        _bronze(spark)[1]
        .groupBy("sector")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("co2_tonnes").isNull(), 1)).alias("n_null"),
            scaled_sum(F.col("co2_tonnes")).alias("sum_co2"),
        )
    )


# ------------------------------------------------------------------ silver


@register(
    "medallion_silver_energy_summary",
    oracle=with_pipeline(
        f"""
    SELECT region, energy_source,
           COUNT(*) AS records,
           {scaled_sum_sql('consumption_mwh')} AS sum_consumption,
           {scaled_sum_sql('temperature_c')} AS sum_temp,
           MIN(date) AS min_date, MAX(date) AS max_date
    FROM silver_energy GROUP BY region, energy_source
    """
    ),
    survey="D1 P1 P2 P3 F1 F2 A8 — full cleaning chain in reference order "
    "(bronze_to_silver.py:16-45; dead-code median preserved, SURVEY §2.3)",
)
def medallion_silver_energy_summary(spark, sf_dir) -> DataFrame:
    e, _ = _silver(spark)
    return e.groupBy("region", "energy_source").agg(
        F.count(F.lit(1)).alias("records"),
        scaled_sum(F.col("consumption_mwh")).alias("sum_consumption"),
        scaled_sum(F.col("temperature_c")).alias("sum_temp"),
        F.min("date").alias("min_date"),
        F.max("date").alias("max_date"),
    )


@register(
    "medallion_silver_emissions_summary",
    oracle=with_pipeline(
        f"""
    SELECT region, sector,
           COUNT(*) AS records,
           {scaled_sum_sql('co2_tonnes')} AS sum_co2,
           MIN(date) AS min_date, MAX(date) AS max_date
    FROM silver_emissions GROUP BY region, sector
    """
    ),
    survey="D1 P1 P2 P3 F1 F2 — emissions cleaning (bronze_to_silver.py:48-75)",
)
def medallion_silver_emissions_summary(spark, sf_dir) -> DataFrame:
    _, m = _silver(spark)
    return m.groupBy("region", "sector").agg(
        F.count(F.lit(1)).alias("records"),
        scaled_sum(F.col("co2_tonnes")).alias("sum_co2"),
        F.min("date").alias("min_date"),
        F.max("date").alias("max_date"),
    )


# ------------------------------------------------------------------ gold


@register(
    "medallion_gold_energy_monthly",
    oracle=with_pipeline("SELECT * FROM gold_energy_monthly"),
    survey="A1 P4 P11 — energy monthly mart, full 384-row content "
    "(silver_to_gold.py:37-45)",
)
def medallion_gold_energy_monthly(spark, sf_dir) -> DataFrame:
    return _gold(spark)[0]


@register(
    "medallion_gold_emissions_monthly",
    oracle=with_pipeline("SELECT * FROM gold_emissions_monthly"),
    survey="A2 P4 — emissions monthly mart, 288 rows (silver_to_gold.py:50-57)",
)
def medallion_gold_emissions_monthly(spark, sf_dir) -> DataFrame:
    return _gold(spark)[1]


@register(
    "medallion_gold_carbon_intensity",
    oracle=with_pipeline("SELECT * FROM gold_carbon_intensity"),
    survey="A3 J1 P7 — carbon-intensity KPI mart, 96 rows "
    "(silver_to_gold.py:64-84)",
)
def medallion_gold_carbon_intensity(spark, sf_dir) -> DataFrame:
    return _gold(spark)[2]


# ------------------------------------------------------------------ star


@register(
    "medallion_dim_time",
    oracle=with_pipeline("SELECT * FROM dim_time"),
    survey="D2 D3 D4 U3 J6 — time dimension with dense surrogate keys; the "
    "star build re-keys facts via broadcast dim joins (J6 as a join, not the "
    "reference's collected dict, star.py) "
    "(load_to_postgres.py:40-56; SQL/01_create_schema.sql:17-22)",
)
def medallion_dim_time(spark, sf_dir) -> DataFrame:
    return _star(spark)["dim_time"]


# ------------------------------------------------------------------ analysis


@register(
    "medallion_analysis_q1",
    oracle=with_pipeline(
        "\n    UNION ALL ".join(
            f"SELECT '{name}' AS table_name, COUNT(*) AS n_rows FROM {name}"
            for name in STAR_TABLES
        )
    ),
    survey="U1 A4 Q2 — q1 row-count report (SQL/03_analysis_queries.sql:2-10)",
)
def medallion_analysis_q1(spark, sf_dir) -> DataFrame:
    return an.q1_row_counts(_star(spark))


@register(
    "medallion_analysis_q2",
    oracle=with_pipeline(
        """
    SELECT r.region_name, t.year, t.month,
           f.total_energy_mwh, f.total_co2_tonnes, f.co2_per_mwh
    FROM fact_carbon_intensity f
    JOIN dim_region r ON r.region_id = f.region_id
    JOIN dim_time t ON t.time_id = f.time_id
    """
    ),
    survey="J4 O1 — q2 monthly intensity by region "
    "(SQL/03_analysis_queries.sql:14-24)",
)
def medallion_analysis_q2(spark, sf_dir) -> DataFrame:
    return an.q2_monthly_intensity(_star(spark))


@register(
    "medallion_analysis_q3",
    oracle=with_pipeline(
        """
    SELECT * FROM (
        SELECT r.region_name, t.year, t.month, f.co2_per_mwh,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY r.region_name
                   ORDER BY f.co2_per_mwh DESC NULLS LAST, t.year, t.month)
                   AS BIGINT) AS rn
        FROM fact_carbon_intensity f
        JOIN dim_region r ON r.region_id = f.region_id
        JOIN dim_time t ON t.time_id = f.time_id
    ) WHERE rn <= 5
    """
    ),
    survey="W1 W2 F4 O2 — q3 top-5 intensity months per region "
    "(SQL/03_analysis_queries.sql:28-45); (year,month) tiebreak added",
)
def medallion_analysis_q3(spark, sf_dir) -> DataFrame:
    return an.q3_top5_intensity_months(_star(spark))


@register(
    "medallion_analysis_q4",
    oracle=with_pipeline(
        f"""
    SELECT s.source_name,
           ROUND({scaled_sum_sql('f.avg_consumption_mwh', 1_000_000)}
                 / CAST(COUNT(*) AS DOUBLE), 2) AS avg_monthly_consumption_mwh
    FROM fact_energy_monthly f
    JOIN dim_energy_source s ON s.source_id = f.source_id
    GROUP BY s.source_name
    """
    ),
    survey="J5 A5 P10 O3 — q4 avg consumption per source "
    "(SQL/03_analysis_queries.sql:49-55)",
)
def medallion_analysis_q4(spark, sf_dir) -> DataFrame:
    return an.q4_avg_consumption_by_source(_star(spark))


@register(
    "medallion_analysis_q5",
    oracle=with_pipeline(
        """
    SELECT r.region_name, t.year, t.month,
           f.total_energy_mwh, f.total_co2_tonnes, f.co2_per_mwh
    FROM fact_carbon_intensity f
    JOIN dim_region r ON r.region_id = f.region_id
    JOIN dim_time t ON t.time_id = f.time_id
    """
    ),
    survey="J4 O4 — q5 emissions vs energy (SQL/03_analysis_queries.sql:59-69)",
)
def medallion_analysis_q5(spark, sf_dir) -> DataFrame:
    return an.q5_emissions_vs_energy(_star(spark))


@register(
    "medallion_analysis_q6",
    oracle=with_pipeline(
        """
    SELECT COUNT(CASE WHEN co2_per_mwh IS NULL THEN 1 END)
               AS null_intensity_rows
    FROM fact_carbon_intensity
    """
    ),
    survey="F5 A6 Q3 — q6 null-intensity DQ check "
    "(SQL/03_analysis_queries.sql:73-76)",
)
def medallion_analysis_q6(spark, sf_dir) -> DataFrame:
    return an.q6_null_intensity_rows(_star(spark))


@register(
    "medallion_analysis_q7",
    oracle=with_pipeline(
        """
    SELECT r.region_name, t.year, t.month, f.co2_per_mwh
    FROM fact_carbon_intensity f
    JOIN dim_region r ON r.region_id = f.region_id
    JOIN dim_time t ON t.time_id = f.time_id
    WHERE t.year = 2024
    """
    ),
    survey="F3 O5 J4 — q7 2024 slice (SQL/03_analysis_queries.sql:80-89)",
)
def medallion_analysis_q7(spark, sf_dir) -> DataFrame:
    return an.q7_intensity_2024(_star(spark))


# ------------------------------------------------------------------ BI (A7)


@register(
    "medallion_bi_intensity_by_month",
    oracle=with_pipeline(
        f"""
    SELECT t.year, t.month,
           {scaled_sum_sql('f.co2_per_mwh', 1_000_000)} AS sum_intensity
    FROM fact_carbon_intensity f
    JOIN dim_time t ON f.time_id = t.time_id
    GROUP BY t.year, t.month
    """
    ),
    survey="A7 J4 — PBI line chart: Sum(co2_per_mwh) by month with year "
    "series (Dashboards/PowerBI Report/Layout, SURVEY §3 entry point 4)",
)
def medallion_bi_intensity_by_month(spark, sf_dir) -> DataFrame:
    star = _star(spark)
    f, dt = star["fact_carbon_intensity"], star["dim_time"]
    return (
        f.join(F.broadcast(dt), "time_id")
        .groupBy("year", "month")
        .agg(
            scaled_sum(F.col("co2_per_mwh"), scale=1_000_000).alias(
                "sum_intensity"
            )
        )
    )


@register(
    "medallion_bi_intensity_by_region",
    oracle=with_pipeline(
        f"""
    SELECT r.region_name,
           {scaled_sum_sql('f.co2_per_mwh', 1_000_000)} AS sum_intensity
    FROM fact_carbon_intensity f
    JOIN dim_region r ON f.region_id = r.region_id
    GROUP BY r.region_name
    """
    ),
    survey="A7 J5 — PBI bar chart: Sum(co2_per_mwh) by region_name",
)
def medallion_bi_intensity_by_region(spark, sf_dir) -> DataFrame:
    star = _star(spark)
    f, dr = star["fact_carbon_intensity"], star["dim_region"]
    return (
        f.join(F.broadcast(dr), "region_id")
        .groupBy("region_name")
        .agg(
            scaled_sum(F.col("co2_per_mwh"), scale=1_000_000).alias(
                "sum_intensity"
            )
        )
    )


@register(
    "medallion_bi_totals_by_month_2024",
    oracle=with_pipeline(
        f"""
    SELECT t.month,
           {scaled_sum_sql('f.total_co2_tonnes')}  AS sum_co2,
           {scaled_sum_sql('f.total_energy_mwh')}  AS sum_energy
    FROM fact_carbon_intensity f
    JOIN dim_time t ON f.time_id = t.time_id
    WHERE t.year = 2024
    GROUP BY t.month
    """
    ),
    survey="A7 F3 J4 — PBI column chart (Sum co2 + Sum energy by month) "
    "under the year slicer (slicer = partition filter)",
)
def medallion_bi_totals_by_month_2024(spark, sf_dir) -> DataFrame:
    star = _star(spark)
    f, dt = star["fact_carbon_intensity"], star["dim_time"]
    return (
        f.join(F.broadcast(dt), "time_id")
        .filter(F.col("year") == 2024)
        .groupBy("month")
        .agg(
            scaled_sum(F.col("total_co2_tonnes")).alias("sum_co2"),
            scaled_sum(F.col("total_energy_mwh")).alias("sum_energy"),
        )
    )
