"""Medallion pipeline (bronze -> silver -> gold -> star), Spark-first.

Re-expresses the reference lakehouse semantics (SURVEY.md §1-§3):
- ``generate``: synthetic dirty bronze tables (reference
  src/00_generate_raw/generate_energy_emissions.py), made cross-engine
  deterministic (integer LCG noise instead of numpy RNG — SURVEY §7 scoped
  numpy bit-parity out; determinism is what the oracle needs).
- ``silver``: cleaning transforms (src/10_silver/bronze_to_silver.py),
  preserving the reference's exact operation ORDER — range filters run
  before median imputation, making the imputation dead code (SURVEY §2.3).
- ``gold``: monthly marts (src/20_gold/silver_to_gold.py).
- ``star``: dims + surrogate keys + facts (SQL/01_create_schema.sql,
  src/30_load/load_to_postgres.py) — re-keying by broadcast join, never by
  collected dicts (the reference's J6 anti-pattern at scale).
- ``analysis``: the 7 analysis queries (SQL/03_analysis_queries.sql).
"""
