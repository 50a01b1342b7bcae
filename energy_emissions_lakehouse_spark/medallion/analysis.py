"""The reference's analysis query suite (SQL/03_analysis_queries.sql q1-q7)
over the star schema, as DataFrame builders.

Deviation noted per SURVEY.md §2.7/§2.8: the reference's window (q3) and
DESC sorts (q7) have no deterministic tiebreak; we add (year, month) to the
window ordering so ranking is total — required for a reproducible result set
(the driver compares order-insensitively, so the extra tiebreak changes
nothing else).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from energy_emissions_lakehouse_spark.functions.exact import scaled_sum


def q1_row_counts(star: dict[str, DataFrame]) -> DataFrame:
    """q1 (:2-10): per-table row-count sanity report (U1/A4)."""
    frames = [
        df.agg(F.lit(name).alias("table_name"), F.count(F.lit(1)).alias("n_rows"))
        for name, df in star.items()
    ]
    return reduce(DataFrame.unionByName, frames)


def _ci_joined(star: dict[str, DataFrame]) -> DataFrame:
    """fact_carbon_intensity x dim_region x dim_time star join (J4) with
    broadcast dims."""
    f = star["fact_carbon_intensity"]
    return f.join(F.broadcast(star["dim_region"]), "region_id").join(
        F.broadcast(star["dim_time"]), "time_id"
    )


def q2_monthly_intensity(star: dict[str, DataFrame]) -> DataFrame:
    """q2 (:14-24): monthly carbon intensity by region."""
    return _ci_joined(star).select(
        "region_name",
        "year",
        "month",
        "total_energy_mwh",
        "total_co2_tonnes",
        "co2_per_mwh",
    )


def q3_top5_intensity_months(star: dict[str, DataFrame]) -> DataFrame:
    """q3 (:28-45): top-5 intensity months per region (W1/W2); ranking made
    total with a (year, month) tiebreak."""
    w = Window.partitionBy("region_name").orderBy(
        F.col("co2_per_mwh").desc_nulls_last(), "year", "month"
    )
    return (
        _ci_joined(star)
        .select(
            "region_name",
            "year",
            "month",
            "co2_per_mwh",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 5)
    )


def q4_avg_consumption_by_source(star: dict[str, DataFrame]) -> DataFrame:
    """q4 (:49-55): ROUND(AVG(avg_consumption_mwh), 2) by source (A5/P10).
    The avg-of-avgs uses a scale-1e6 integer sum so both engines agree
    exactly before the final round."""
    f = star["fact_energy_monthly"]
    joined = f.join(F.broadcast(star["dim_energy_source"]), "source_id")
    n = F.count(F.lit(1)).cast("double")
    return joined.groupBy("source_name").agg(
        F.round(
            scaled_sum(F.col("avg_consumption_mwh"), scale=1_000_000) / n, 2
        ).alias("avg_monthly_consumption_mwh")
    )


def q5_emissions_vs_energy(star: dict[str, DataFrame]) -> DataFrame:
    """q5 (:59-69): same projection as q2 with time-major ordering — content
    identical, kept for suite parity."""
    return q2_monthly_intensity(star)


def q6_null_intensity_rows(star: dict[str, DataFrame]) -> DataFrame:
    """q6 (:73-76): DQ check — count of null co2_per_mwh (F5/A6)."""
    return star["fact_carbon_intensity"].agg(
        F.count(F.when(F.col("co2_per_mwh").isNull(), F.lit(1))).alias(
            "null_intensity_rows"
        )
    )


def q7_intensity_2024(star: dict[str, DataFrame]) -> DataFrame:
    """q7 (:80-89): year-2024 slice ordered by intensity (F3/O5).
    Partition pruning target when gold is partitioned by year."""
    return (
        _ci_joined(star)
        .filter(F.col("year") == 2024)
        .select("region_name", "year", "month", "co2_per_mwh")
    )
