"""DuckDB oracle SQL mirroring the medallion pipeline bit-for-bit.

Every CTE here corresponds to a function in generate/silver/gold/star/
analysis; formulas MUST stay in lockstep with the Spark side. The whole
pipeline is one WITH chain (DuckDB plans lazily, unused CTEs are free), so a
query over any layer just appends its final SELECT via :func:`with_pipeline`.

Cross-engine gotchas encoded here (the hard-won ones):
- integer division must be ``//`` in DuckDB: ``CAST(x/100 AS BIGINT)`` would
  ROUND in DuckDB but TRUNCATE in Spark;
- double->BIGINT casts only ever happen on integer-valued doubles (ROUND
  output), where both engines agree;
- the uniform/normal noise is pure int64 + one exact IEEE division, so the
  generated doubles are identical bit patterns in both engines.
"""

from __future__ import annotations

from energy_emissions_lakehouse_spark.functions.exact import scaled_sum_sql
from energy_emissions_lakehouse_spark.medallion.generate import (
    N_DAYS,
    REGIONS,
    SECTOR_MULT,
    SECTORS,
    SOURCES,
    SQRT3,
    START_DATE,
)

# ---------------------------------------------------------------- noise


def u_sql(k: str, salt: int) -> str:
    """Mirror of generate._u — two LCG steps mod 2^31-1."""
    x = f"((({k}) + 1) * {2 * salt + 1})"
    h1 = f"(({x} * 1103515245 + 12345) % 2147483647)"
    h2 = f"(({h1} * 1103515245 + 12345) % 2147483647)"
    return f"(CAST({h2} AS DOUBLE) / 2147483647.0)"


def normal_sql(k: str, salt: int) -> str:
    """Mirror of generate._normal — Irwin-Hall(4)."""
    s = " + ".join(u_sql(k, 4 * salt + i) for i in (1, 2, 3, 4))
    return f"((({s}) - 2.0) * {SQRT3!r})"


def _case_pick(idx: str, values: list[str]) -> str:
    whens = " ".join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(values[:-1]))
    return f"CASE {idx} {whens} ELSE '{values[-1]}' END"


_SEASON = (
    "CASE WHEN mon IN (12, 1, 2) THEN 1.25 "
    "WHEN mon IN (6, 7, 8) THEN 1.10 ELSE 1.0 END"
)

# ---------------------------------------------------------------- CTE chain

_CTES: list[tuple[str, str]] = []


def _cte(name: str, body: str) -> None:
    _CTES.append((name, body))


_cte(
    "energy_grid",
    f"""
    SELECT gd.d, gr.r, gs.s, ((gd.d * 4 + gr.r) * 4 + gs.s) AS k,
           DATE '{START_DATE}' + CAST(gd.d AS INTEGER) AS dt
    FROM range({N_DAYS}) AS gd(d)
    CROSS JOIN range({len(REGIONS)}) AS gr(r)
    CROSS JOIN range({len(SOURCES)}) AS gs(s)
    """,
)

_cte(
    "energy_base",
    f"""
    SELECT k, r, s, dt, CAST(MONTH(dt) AS BIGINT) AS mon,
           CAST(ROUND((12.0 + 8.0 * {normal_sql('k', 0)}) * 100, 0) AS BIGINT)
               AS temp_bp
    FROM energy_grid
    """,
)

_cte(
    "energy_vals",
    f"""
    SELECT k, r, s, dt,
           CAST(temp_bp AS DOUBLE) / 100.0 AS temperature_c,
           CAST(ROUND(GREATEST(0.0,
                (900.0 + 180.0 * {normal_sql('k', 1)}) * ({_SEASON})
                + (8.0 - CAST(temp_bp AS DOUBLE) / 100.0) * 18.0) * 100, 0)
                AS BIGINT) AS cons_bp
    FROM energy_base
    """,
)

_cte(
    "energy_rows",
    f"""
    SELECT k,
           CASE WHEN k % 1000 = 999 THEN 'not-a-date'
                ELSE STRFTIME(dt, '%Y-%m-%d') END AS date,
           CASE WHEN k % 7 = 0 THEN {_case_pick('r', REGIONS)} || ' '
                ELSE {_case_pick('r', REGIONS)} END AS region,
           {_case_pick('s', SOURCES)} AS energy_source,
           CASE WHEN k % 50 = 17 THEN NULL
                WHEN k % 97 = 3 THEN 'N/A'
                ELSE CAST(cons_bp // 100 AS VARCHAR) || '.' ||
                     LPAD(CAST(cons_bp % 100 AS VARCHAR), 2, '0')
           END AS consumption_mwh,
           temperature_c
    FROM energy_vals
    """,
)

_cte(
    "bronze_energy",
    """
    SELECT date, region, energy_source, consumption_mwh, temperature_c
    FROM energy_rows
    UNION ALL
    SELECT date, region, energy_source, consumption_mwh, temperature_c
    FROM energy_rows WHERE k % 100 = 42
    """,
)

_cte(
    "emissions_grid",
    f"""
    SELECT gd.d, gr.r, gc.c, ((gd.d * 4 + gr.r) * 3 + gc.c) AS k,
           DATE '{START_DATE}' + CAST(gd.d AS INTEGER) AS dt
    FROM range({N_DAYS}) AS gd(d)
    CROSS JOIN range({len(REGIONS)}) AS gr(r)
    CROSS JOIN range({len(SECTORS)}) AS gc(c)
    """,
)

_cte(
    "emissions_vals",
    f"""
    SELECT k, r, c, dt, CAST(MONTH(dt) AS BIGINT) AS mon,
           CAST(ROUND(GREATEST(0.0,
                (420.0 + 90.0 * {normal_sql('k', 25)})
                * (CASE WHEN CAST(MONTH(dt) AS BIGINT) IN (12, 1, 2) THEN 1.25
                        WHEN CAST(MONTH(dt) AS BIGINT) IN (6, 7, 8) THEN 1.10
                        ELSE 1.0 END)
                * (CASE c WHEN 0 THEN {SECTOR_MULT[0]} WHEN 1 THEN {SECTOR_MULT[1]}
                          ELSE {SECTOR_MULT[2]} END)) * 100, 0) AS BIGINT)
               AS co2_bp
    FROM emissions_grid
    """,
)

_cte(
    "bronze_emissions",
    f"""
    SELECT STRFTIME(dt, '%Y-%m-%d') AS date,
           {_case_pick('r', REGIONS)} AS region,
           {_case_pick('c', SECTORS)} AS sector,
           CASE WHEN k % 67 = 1 THEN NULL
                ELSE CAST(co2_bp AS DOUBLE) / 100.0 END AS co2_tonnes
    FROM emissions_vals
    """,
)

# silver (order matters: dedup -> coerce -> filter -> dead-code impute -> dropna)

_cte("se_dedup", "SELECT DISTINCT * FROM bronze_energy")
_cte(
    "se_typed",
    """
    SELECT TRY_STRPTIME(date, '%Y-%m-%d') AS date,
           TRIM(region) AS region,
           TRIM(energy_source) AS energy_source,
           TRY_CAST(consumption_mwh AS DOUBLE) AS consumption_mwh,
           TRY_CAST(temperature_c AS DOUBLE) AS temperature_c
    FROM se_dedup
    """,
)
_cte(
    "se_filtered",
    """
    SELECT * FROM se_typed
    WHERE temperature_c BETWEEN -40.0 AND 60.0
      AND consumption_mwh BETWEEN 0.0 AND 2000000.0
    """,
)
_cte(
    "silver_energy",
    """
    SELECT date, region, energy_source,
           COALESCE(consumption_mwh,
                    (SELECT MEDIAN(consumption_mwh) FROM se_filtered))
               AS consumption_mwh,
           temperature_c
    FROM se_filtered
    WHERE date IS NOT NULL
    """,
)

_cte("sm_dedup", "SELECT DISTINCT * FROM bronze_emissions")
_cte(
    "sm_typed",
    """
    SELECT TRY_STRPTIME(date, '%Y-%m-%d') AS date,
           TRIM(region) AS region,
           TRIM(sector) AS sector,
           TRY_CAST(co2_tonnes AS DOUBLE) AS co2_tonnes
    FROM sm_dedup
    """,
)
_cte(
    "sm_filtered",
    "SELECT * FROM sm_typed WHERE co2_tonnes BETWEEN 0.0 AND 5000000.0",
)
_cte(
    "silver_emissions",
    """
    SELECT date, region, sector,
           COALESCE(co2_tonnes, (SELECT MEDIAN(co2_tonnes) FROM sm_filtered))
               AS co2_tonnes
    FROM sm_filtered
    WHERE date IS NOT NULL
    """,
)

# gold

_cte(
    "ge",
    """
    SELECT *, CAST(YEAR(date) AS BIGINT) AS year,
           CAST(MONTH(date) AS BIGINT) AS month
    FROM silver_energy
    """,
)
_cte(
    "gm",
    """
    SELECT *, CAST(YEAR(date) AS BIGINT) AS year,
           CAST(MONTH(date) AS BIGINT) AS month
    FROM silver_emissions
    """,
)
_cte(
    "gold_energy_monthly",
    f"""
    SELECT region, energy_source, year, month,
           {scaled_sum_sql('consumption_mwh')} / CAST(COUNT(*) AS DOUBLE)
               AS avg_consumption_mwh,
           MAX(consumption_mwh) AS max_consumption_mwh,
           {scaled_sum_sql('temperature_c')} / CAST(COUNT(*) AS DOUBLE)
               AS avg_temp_c,
           COUNT(*) AS records
    FROM ge GROUP BY region, energy_source, year, month
    """,
)
_cte(
    "gold_emissions_monthly",
    f"""
    SELECT region, sector, year, month,
           {scaled_sum_sql('co2_tonnes')} / CAST(COUNT(*) AS DOUBLE)
               AS avg_co2_tonnes,
           {scaled_sum_sql('co2_tonnes')} AS total_co2_tonnes,
           COUNT(*) AS records
    FROM gm GROUP BY region, sector, year, month
    """,
)
_cte(
    "ci_energy",
    f"""
    SELECT region, year, month,
           {scaled_sum_sql('consumption_mwh')} AS total_energy_mwh
    FROM ge GROUP BY region, year, month
    """,
)
_cte(
    "ci_emissions",
    f"""
    SELECT region, year, month, {scaled_sum_sql('co2_tonnes')} AS total_co2_tonnes
    FROM gm GROUP BY region, year, month
    """,
)
_cte(
    "gold_carbon_intensity",
    """
    SELECT e.region, e.year, e.month, e.total_energy_mwh, m.total_co2_tonnes,
           m.total_co2_tonnes / NULLIF(e.total_energy_mwh, 0.0) AS co2_per_mwh
    FROM ci_energy e
    JOIN ci_emissions m
      ON e.region = m.region AND e.year = m.year AND e.month = m.month
    """,
)

# star schema

_cte(
    "dim_region",
    """
    SELECT region_name,
           CAST(ROW_NUMBER() OVER (ORDER BY region_name) AS BIGINT) AS region_id
    FROM (SELECT DISTINCT region AS region_name FROM (
          SELECT region FROM gold_energy_monthly
          UNION SELECT region FROM gold_emissions_monthly
          UNION SELECT region FROM gold_carbon_intensity))
    """,
)
_cte(
    "dim_energy_source",
    """
    SELECT source_name,
           CAST(ROW_NUMBER() OVER (ORDER BY source_name) AS BIGINT) AS source_id
    FROM (SELECT DISTINCT energy_source AS source_name FROM gold_energy_monthly)
    """,
)
_cte(
    "dim_sector",
    """
    SELECT sector_name,
           CAST(ROW_NUMBER() OVER (ORDER BY sector_name) AS BIGINT) AS sector_id
    FROM (SELECT DISTINCT sector AS sector_name FROM gold_emissions_monthly)
    """,
)
_cte(
    "dim_time",
    """
    SELECT year, month,
           CAST(ROW_NUMBER() OVER (ORDER BY year, month) AS BIGINT) AS time_id
    FROM (SELECT DISTINCT year, month FROM (
          SELECT year, month FROM gold_energy_monthly
          UNION SELECT year, month FROM gold_emissions_monthly
          UNION SELECT year, month FROM gold_carbon_intensity))
    """,
)
_cte(
    "fact_energy_monthly",
    """
    SELECT r.region_id, s.source_id, t.time_id,
           g.avg_consumption_mwh, g.max_consumption_mwh, g.avg_temp_c, g.records
    FROM gold_energy_monthly g
    JOIN dim_region r ON g.region = r.region_name
    JOIN dim_energy_source s ON g.energy_source = s.source_name
    JOIN dim_time t ON g.year = t.year AND g.month = t.month
    """,
)
_cte(
    "fact_emissions_monthly",
    """
    SELECT r.region_id, s.sector_id, t.time_id,
           g.avg_co2_tonnes, g.total_co2_tonnes, g.records
    FROM gold_emissions_monthly g
    JOIN dim_region r ON g.region = r.region_name
    JOIN dim_sector s ON g.sector = s.sector_name
    JOIN dim_time t ON g.year = t.year AND g.month = t.month
    """,
)
_cte(
    "fact_carbon_intensity",
    """
    SELECT r.region_id, t.time_id,
           g.total_energy_mwh, g.total_co2_tonnes, g.co2_per_mwh
    FROM gold_carbon_intensity g
    JOIN dim_region r ON g.region = r.region_name
    JOIN dim_time t ON g.year = t.year AND g.month = t.month
    """,
)


def with_pipeline(final_select: str) -> str:
    """Compose the full pipeline WITH chain + a final SELECT.

    CTEs that the final SELECT actually reaches AND that are referenced
    more than once (from other reachable bodies or the final SELECT) are
    emitted ``AS MATERIALIZED``: DuckDB inlines plain CTEs, so a
    multi-referenced gold table re-derives the whole generate->silver->
    gold chain per reference (medallion_analysis_q1 measured 4.6 s at
    sf0.01 from exactly this). Materialization must be REACHABILITY-
    gated — DuckDB does NOT prune unused MATERIALIZED CTEs (measured:
    an unreferenced one still evaluates), so blanket marking would force
    every query to pay the full pipeline. Value-neutral either way;
    single-referenced and unreachable CTEs stay plain (inlined / pruned
    free, as before)."""
    import re

    def strip_noise(text: str) -> str:
        # a CTE name inside a string literal or a '--' comment is not a
        # reference (round-5 advice): an accidental match would force a
        # needless MATERIALIZED evaluation (value-neutral, perf-only).
        # ONE alternation pass so whichever construct starts first wins:
        # sequential passes mis-lex both orders (a quoted '--' eats a
        # line comment-first; an apostrophe in a comment like "don't"
        # opens a phantom literal that swallows real SQL literal-first).
        return re.sub(
            r"'(?:[^']|'')*'|--[^\n]*",
            lambda m: "''" if m.group(0).startswith("'") else "",
            text,
        )

    def refs(stripped: str, name: str) -> int:
        return len(re.findall(rf"\b{re.escape(name)}\b", stripped))

    # strip each body exactly once (refs() is called O(CTEs) times per
    # consumer below — re-stripping per call was quadratic regex work)
    bodies = dict(_CTES)
    stripped = {name: strip_noise(body) for name, body in _CTES}
    stripped_final = strip_noise(final_select)
    # reachability: walk upstream from the final SELECT (bodies only ever
    # reference earlier CTEs, so one reverse pass converges)
    reachable: set[str] = set()
    frontier = [stripped_final]
    while frontier:
        text = frontier.pop()
        for name in bodies:
            if name not in reachable and refs(text, name):
                reachable.add(name)
                frontier.append(stripped[name])
    # reference counts from reachable consumers only
    counts = {name: refs(stripped_final, name) for name in reachable}
    for consumer in reachable:
        for name in reachable:
            if name != consumer:
                counts[name] += refs(stripped[consumer], name)
    ctes = ",\n".join(
        f"{name} AS MATERIALIZED ({body})"
        if name in reachable and counts[name] > 1
        else f"{name} AS ({body})"
        for name, body in _CTES
    )
    return f"WITH {ctes}\n{final_select}"
