"""Deterministic synthetic bronze generator (SURVEY.md §2.1 S9, §2.10 R1).

Reference: src/00_generate_raw/generate_energy_emissions.py — nested Python
loops over dates x regions x (sources|sectors) with seeded numpy noise and
injected dirt (2% null consumption, 1% literal "N/A", ~1% duplicate rows).

Spark-first redesign: the grid is a cross join of ``spark.range`` frames
(pure JVM, scales to any cardinality); the noise is an integer LCG evaluated
per row key — deterministic, partition-order independent, and exactly
reproducible in ANSI SQL, which makes the whole medallion pipeline
oracle-checkable (numpy bit-parity was scoped out in SURVEY §7 step 6).

Cross-engine exactness rules used throughout:
- all randomness is int64 arithmetic (exact in both engines);
- continuous values are quantized to integer basis points ("bp" = value*100)
  before use, so doubles are identical bit patterns in Spark and DuckDB;
- the string form of consumption is built from integers (never double->string
  formatting, which is engine-specific).

The matching DuckDB SQL lives in medallion/sql_oracle.py; the formulas here
and there MUST stay in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from energy_emissions_lakehouse_spark.session import configure_runtime

REGIONS = ["North", "South", "East", "West"]
SOURCES = ["Electricity", "Gas", "Oil", "Renewables"]
SECTORS = ["Residential", "Industry", "Transport"]
SECTOR_MULT = [0.9, 1.3, 1.15]
N_DAYS = 731  # 2023-01-01 .. 2024-12-31, reference generate:30
START_DATE = "2023-01-01"
SQRT3 = 1.7320508075688772  # Irwin-Hall(4) std normalization


def _u(k: Column, salt: int) -> Column:
    """Uniform(0,1) from row key ``k``: two LCG steps mod 2^31-1.

    int64-exact: max intermediate = (2^31-1) * 1103515245 + 12345 < 2^62.
    """
    x = (k + 1) * F.lit(2 * salt + 1)
    h1 = (x * F.lit(1103515245) + F.lit(12345)) % F.lit(2147483647)
    h2 = (h1 * F.lit(1103515245) + F.lit(12345)) % F.lit(2147483647)
    return h2.cast("double") / F.lit(2147483647.0)


def _normal(k: Column, salt: int) -> Column:
    """~N(0,1) via Irwin-Hall(4): sum of 4 uniforms, centered and scaled.
    Uses only +,*,/ so the double result is bit-identical cross-engine."""
    s = _u(k, 4 * salt + 1) + _u(k, 4 * salt + 2) + _u(k, 4 * salt + 3) + _u(
        k, 4 * salt + 4
    )
    return (s - F.lit(2.0)) * F.lit(SQRT3)


def _bp(raw: Column) -> Column:
    """Quantize to integer basis points (cents)."""
    return F.round(raw * F.lit(100), 0).cast("long")


def _bp_to_double(bp: Column) -> Column:
    return bp.cast("double") / F.lit(100.0)


def _grid(spark: SparkSession, name: str, n: int) -> DataFrame:
    # Partition count sized to the grid: the reference workload is fixed at
    # ~20k rows, where default parallelism (32) just buys task-scheduling
    # overhead. At larger cardinalities (the 100 TB story: more days x more
    # entities) this scales back up to one partition per ~1k keys.
    parts = max(1, min(n // 1000 + 1, 32))
    return spark.range(0, n, 1, parts).select(
        F.col("id").cast("long").alias(name)
    )


def _pick(idx: Column, values: list[str]) -> Column:
    expr = F.when(idx == 0, F.lit(values[0]))
    for i, v in enumerate(values[1:], start=1):
        expr = expr.when(idx == i, F.lit(v))
    return expr


def _season_factor(month: Column) -> Column:
    """Seasonal multiplier (reference generate:41-42): winter 1.25,
    summer 1.10, else 1.0."""
    return (
        F.when(month.isin(12, 1, 2), F.lit(1.25))
        .when(month.isin(6, 7, 8), F.lit(1.10))
        .otherwise(F.lit(1.0))
    )


def bronze_energy(spark: SparkSession) -> DataFrame:
    """energy_raw(date:str, region:str, energy_source:str,
    consumption_mwh:str|null, temperature_c:double) — dirty by design:
    k%50==17 -> null, k%97==3 -> 'N/A', k%1000==999 -> invalid date,
    k%7==0 -> trailing space in region, k%100==42 rows duplicated."""
    configure_runtime(spark)
    grid = (
        _grid(spark, "d", N_DAYS)
        .crossJoin(_grid(spark, "r", len(REGIONS)))
        .crossJoin(_grid(spark, "s", len(SOURCES)))
    )
    k = (F.col("d") * 4 + F.col("r")) * 4 + F.col("s")
    date = F.date_add(F.lit(START_DATE).cast("date"), F.col("d").cast("int"))
    month = F.month(date)

    temp_bp = _bp(F.lit(12.0) + F.lit(8.0) * _normal(k, 0))
    temp = _bp_to_double(temp_bp)
    cons_raw = F.greatest(
        F.lit(0.0),
        (F.lit(900.0) + F.lit(180.0) * _normal(k, 1)) * _season_factor(month)
        + (F.lit(8.0) - temp) * F.lit(18.0),
    )
    cons_bp = _bp(cons_raw)
    cons_str = F.concat(
        (cons_bp / F.lit(100)).cast("long").cast("string"),
        F.lit("."),
        F.lpad((cons_bp % F.lit(100)).cast("string"), 2, "0"),
    )
    base = grid.select(
        k.alias("k"),
        F.when(k % 1000 == 999, F.lit("not-a-date"))
        .otherwise(F.date_format(date, "yyyy-MM-dd"))
        .alias("date"),
        F.when(k % 7 == 0, F.concat(_pick(F.col("r"), REGIONS), F.lit(" ")))
        .otherwise(_pick(F.col("r"), REGIONS))
        .alias("region"),
        _pick(F.col("s"), SOURCES).alias("energy_source"),
        F.when(k % 50 == 17, F.lit(None).cast("string"))
        .when(k % 97 == 3, F.lit("N/A"))
        .otherwise(cons_str)
        .alias("consumption_mwh"),
        temp.alias("temperature_c"),
    )
    dupes = base.filter(F.col("k") % 100 == 42)
    return base.unionByName(dupes).drop("k")


def bronze_emissions(spark: SparkSession) -> DataFrame:
    """emissions_raw(date:str, region:str, sector:str, co2_tonnes:double|null)
    — 1.5%-ish nulls (k%67==1), no duplicates (reference generate:80-96)."""
    configure_runtime(spark)
    grid = (
        _grid(spark, "d", N_DAYS)
        .crossJoin(_grid(spark, "r", len(REGIONS)))
        .crossJoin(_grid(spark, "c", len(SECTORS)))
    )
    k = (F.col("d") * 4 + F.col("r")) * 3 + F.col("c")
    date = F.date_add(F.lit(START_DATE).cast("date"), F.col("d").cast("int"))
    month = F.month(date)
    mult = (
        F.when(F.col("c") == 0, F.lit(SECTOR_MULT[0]))
        .when(F.col("c") == 1, F.lit(SECTOR_MULT[1]))
        .otherwise(F.lit(SECTOR_MULT[2]))
    )
    co2_raw = F.greatest(
        F.lit(0.0),
        (F.lit(420.0) + F.lit(90.0) * _normal(k, 25)) * _season_factor(month) * mult,
    )
    co2 = _bp_to_double(_bp(co2_raw))
    return grid.select(
        F.date_format(date, "yyyy-MM-dd").alias("date"),
        _pick(F.col("r"), REGIONS).alias("region"),
        _pick(F.col("c"), SECTORS).alias("sector"),
        F.when(k % 67 == 1, F.lit(None).cast("double")).otherwise(co2).alias(
            "co2_tonnes"
        ),
    )
