"""Relational upsert / insert-if-missing (SURVEY.md §2.1 S7/S8).

The reference loads its warehouse with staging tables + Postgres
``INSERT ... ON CONFLICT DO UPDATE`` (load_to_postgres.py:73-117) and
``INSERT ... SELECT ... LEFT JOIN ... WHERE key IS NULL`` (:29-35).
Spark-first equivalents, expressed as pure DataFrame algebra so they run
anywhere (and so the oracle can check them); on a Delta/Iceberg table the
storage-level ``MERGE INTO`` replaces the rewrite with a row-level commit.

Scale: both operators are a single equi-join on the key columns — shuffle
hash join on big-big, broadcast when the source is small. No collects.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """MERGE semantics: source wins on key conflict, unmatched target rows
    survive, unmatched source rows are inserted. Idempotent: applying the
    same source twice yields the same result (load_to_postgres.py:13)."""
    keys = list(keys)
    kept_target = target.join(source.select(*keys).distinct(), on=keys, how="left_anti")
    return kept_target.unionByName(source.select(*target.columns))


def insert_missing(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Insert-if-missing: append only source rows whose key is absent from
    target (dimension load pattern, load_to_postgres.py:29-35)."""
    keys = list(keys)
    new_rows = source.join(target.select(*keys).distinct(), on=keys, how="left_anti")
    return target.unionByName(new_rows.select(*target.columns))
