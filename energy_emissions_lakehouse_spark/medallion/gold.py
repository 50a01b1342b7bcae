"""Silver -> Gold monthly marts (reference src/20_gold/silver_to_gold.py).

Aggregates use the scaled-integer sum (functions/exact.py): silver values are
already cent-quantized by the generator, so scale=100 introduces ZERO
quantization error while making sums order-independent — Spark's partial
aggregation and the DuckDB oracle agree bit-for-bit.

Gold semantics notes (SURVEY.md §2.6):
- ``records`` counts all rows (pandas ``size``) -> count(lit(1)).
- ``co2_per_mwh`` is null when total energy is 0 (silver_to_gold.py:81-84).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from energy_emissions_lakehouse_spark.functions.exact import scaled_sum


def _with_year_month(df: DataFrame) -> DataFrame:
    """P4: year/month derivation (silver_to_gold.py:31-32); BIGINT for
    cross-engine schema parity."""
    return df.withColumn("year", F.year("date").cast("long")).withColumn(
        "month", F.month("date").cast("long")
    )


def energy_monthly(energy_silver: DataFrame) -> DataFrame:
    """A1 (silver_to_gold.py:37-45): mean/max/mean/size by 4 keys."""
    n = F.count(F.lit(1))
    return (
        _with_year_month(energy_silver)
        .groupBy("region", "energy_source", "year", "month")
        .agg(
            (scaled_sum(F.col("consumption_mwh")) / n.cast("double")).alias(
                "avg_consumption_mwh"
            ),
            F.max("consumption_mwh").alias("max_consumption_mwh"),
            (scaled_sum(F.col("temperature_c")) / n.cast("double")).alias(
                "avg_temp_c"
            ),
            n.alias("records"),
        )
    )


def emissions_monthly(emissions_silver: DataFrame) -> DataFrame:
    """A2 (silver_to_gold.py:50-57): mean/sum/size by 4 keys."""
    n = F.count(F.lit(1))
    return (
        _with_year_month(emissions_silver)
        .groupBy("region", "sector", "year", "month")
        .agg(
            (scaled_sum(F.col("co2_tonnes")) / n.cast("double")).alias(
                "avg_co2_tonnes"
            ),
            scaled_sum(F.col("co2_tonnes")).alias("total_co2_tonnes"),
            n.alias("records"),
        )
    )


def carbon_intensity(
    energy_silver: DataFrame, emissions_silver: DataFrame
) -> DataFrame:
    """A3 + J1 + P7 (silver_to_gold.py:64-84): regional monthly totals,
    inner-joined, with null-safe CO2-per-MWh division."""
    e = (
        _with_year_month(energy_silver)
        .groupBy("region", "year", "month")
        .agg(scaled_sum(F.col("consumption_mwh")).alias("total_energy_mwh"))
    )
    m = (
        _with_year_month(emissions_silver)
        .groupBy("region", "year", "month")
        .agg(scaled_sum(F.col("co2_tonnes")).alias("total_co2_tonnes"))
    )
    joined = e.join(m, ["region", "year", "month"], "inner")
    return joined.withColumn(
        "co2_per_mwh",
        F.col("total_co2_tonnes") / F.nullif(F.col("total_energy_mwh"), F.lit(0.0)),
    )
