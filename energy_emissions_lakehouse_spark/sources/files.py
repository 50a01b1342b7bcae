"""File sources/sinks for the medallion layers (SURVEY.md §2.1 S1-S4).

Reference behavior being reproduced:
- S1 bronze CSV write with header (generate_energy_emissions.py:123-124);
- S2 bronze CSV read where pandas' default na_values silently nulls
  empty fields (bronze_to_silver.py:18,50) — Spark needs ``nullValue=""``
  and must NOT trim whitespace (the generator injects trailing spaces the
  cleaning layer is supposed to strip itself);
- S3/S4 parquet layer writes/reads (bronze_to_silver.py:45,75;
  silver_to_gold.py:26-27,87-89).

Scale note: these run through Spark's distributed writers/readers — one
file per partition, commit-protocol atomic. Layer boundaries materialized
this way are the 100 TB medallion contract (each layer independently
re-runnable), exactly as SURVEY.md §3 prescribes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_csv(df: DataFrame, path: str) -> None:
    """S1: header CSV sink. Whitespace preserved verbatim — Spark's write
    default (ignoreLeading/TrailingWhiteSpace=true) would silently launder
    the dirty data the silver layer must clean."""
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """S2: bronze CSV scan with explicit schema (no inference pass — at
    100 TB an inference scan doubles the read). Empty fields -> null
    (pandas-read_csv parity); literal "N/A" strings survive to the cleaning
    cast, same end state as pandas' default na_values (SURVEY §1.4)."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("nullValue", "")
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(path)
    )


def write_parquet(df: DataFrame, path: str) -> None:
    """S3: columnar layer sink (silver/gold)."""
    df.write.mode("overwrite").parquet(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S4: columnar layer scan — column pruning + predicate pushdown free."""
    return spark.read.parquet(path)


def compact_small_files(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_files: int,
) -> None:
    """Small-files compaction: rewrite a fragmented parquet directory into
    ``target_files`` right-sized files. The classic lakehouse maintenance
    op — streaming sinks and over-parallel writers leave thousands of
    KB-sized files whose per-file open/footer cost dominates scans at
    100 TB. One coalesce(n) write; on a cluster, pick n from
    total_bytes / spark.sql.files.maxPartitionBytes."""
    df = spark.read.parquet(src_dir)
    df.coalesce(target_files).write.mode("overwrite").parquet(dst_dir)


def write_sorted_by(
    df: DataFrame, path: str, sort_cols: list[str], n_files: int = 4
) -> None:
    """Sort-clustered parquet write: range-partition by ``sort_cols`` and
    sort within each file, so every row group's min/max stats cover a
    narrow, non-overlapping slice of the sort key. Filters on that key
    then skip whole row groups / files from the footer stats alone — the
    poor man's Z-ORDER, and the right layout for time-filtered scans.
    (repartitionByRange samples the key distribution, so file sizes stay
    balanced even under skew.)"""
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
