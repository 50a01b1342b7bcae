"""Gold -> star-schema warehouse layer (reference SQL/01_create_schema.sql,
src/30_load/load_to_postgres.py).

Spark-first deviations from the reference, per SURVEY.md §3 entry point 2:
- surrogate keys via ROW_NUMBER() over a sorted distinct (dense, stable),
  replacing Postgres SERIAL;
- fact re-keying via *broadcast joins* against the dims, replacing the
  reference's collected name->id Python dicts (load_to_postgres.py:153-180)
  which would not scale;
- PK/FK/UNIQUE constraints become procedural invariants: dedup before
  build + the fail-fast null audit (load_to_postgres.py:182-187).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dim_from_values(values: DataFrame, name_col: str, id_col: str) -> DataFrame:
    """Distinct + sort + dense surrogate ids (load_to_postgres.py:21,29-35).
    The window is over the (tiny) distinct value set — never the facts."""
    w = Window.orderBy(name_col)
    return (
        values.distinct()
        .select(F.col(name_col), F.row_number().over(w).cast("long").alias(id_col))
    )


def build_star(
    energy_monthly: DataFrame,
    emissions_monthly: DataFrame,
    carbon_intensity: DataFrame,
) -> dict[str, DataFrame]:
    """Build 4 dims + 3 facts from the gold marts. Returns name -> DataFrame
    keyed like the warehouse DDL (SQL/01_create_schema.sql)."""
    regions = (
        energy_monthly.select(F.col("region").alias("region_name"))
        .union(emissions_monthly.select("region"))
        .union(carbon_intensity.select("region"))
    )
    dim_region = _dim_from_values(regions, "region_name", "region_id")
    dim_energy_source = _dim_from_values(
        energy_monthly.select(F.col("energy_source").alias("source_name")),
        "source_name",
        "source_id",
    )
    dim_sector = _dim_from_values(
        emissions_monthly.select(F.col("sector").alias("sector_name")),
        "sector_name",
        "sector_id",
    )
    # dim_time: distinct (year, month) across all marts (D4,
    # load_to_postgres.py:138-141), id ordered by (year, month).
    times = (
        energy_monthly.select("year", "month")
        .union(emissions_monthly.select("year", "month"))
        .union(carbon_intensity.select("year", "month"))
        .distinct()
    )
    w_time = Window.orderBy("year", "month")
    dim_time = times.select(
        "year", "month", F.row_number().over(w_time).cast("long").alias("time_id")
    )

    # Fact re-keying: broadcast dim joins (J6 as a join, not a dict).
    fact_energy_monthly = (
        energy_monthly.join(
            F.broadcast(dim_region),
            energy_monthly.region == dim_region.region_name,
        )
        .join(
            F.broadcast(dim_energy_source),
            energy_monthly.energy_source == dim_energy_source.source_name,
        )
        .join(F.broadcast(dim_time), ["year", "month"])
        .select(
            "region_id",
            "source_id",
            "time_id",
            "avg_consumption_mwh",
            "max_consumption_mwh",
            "avg_temp_c",
            "records",
        )
    )
    fact_emissions_monthly = (
        emissions_monthly.join(
            F.broadcast(dim_region),
            emissions_monthly.region == dim_region.region_name,
        )
        .join(
            F.broadcast(dim_sector),
            emissions_monthly.sector == dim_sector.sector_name,
        )
        .join(F.broadcast(dim_time), ["year", "month"])
        .select(
            "region_id",
            "sector_id",
            "time_id",
            "avg_co2_tonnes",
            "total_co2_tonnes",
            "records",
        )
    )
    fact_carbon_intensity = (
        carbon_intensity.join(
            F.broadcast(dim_region),
            carbon_intensity.region == dim_region.region_name,
        )
        .join(F.broadcast(dim_time), ["year", "month"])
        .select(
            "region_id",
            "time_id",
            "total_energy_mwh",
            "total_co2_tonnes",
            "co2_per_mwh",
        )
    )
    return {
        "dim_region": dim_region,
        "dim_energy_source": dim_energy_source,
        "dim_sector": dim_sector,
        "dim_time": dim_time,
        "fact_energy_monthly": fact_energy_monthly,
        "fact_emissions_monthly": fact_emissions_monthly,
        "fact_carbon_intensity": fact_carbon_intensity,
    }


def audit_no_nulls(df: DataFrame, allow: set[str] = frozenset()) -> None:
    """Fail-fast null audit (Q1, load_to_postgres.py:182-187): one aggregate
    pass; raises with the offending columns."""
    counts = df.agg(
        *[
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(c)
            for c in df.columns
            if c not in allow
        ]
    ).first()
    bad = [c for c, v in counts.asDict().items() if v]
    if bad:
        raise ValueError(f"null values in non-nullable columns: {bad}")
