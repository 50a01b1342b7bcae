"""Entity resolution / record linkage (extension surface).

The reference's warehouse load assumes clean surrogate keys
(`/root/reference/src/30_load/load_to_postgres.py` upserts on exact
natural keys); real ingest at 100 TB has to LINK dirty records to the
canonical dimension first. This module adds the classic scalable ER
pipeline over the `customer` dimension:

    block -> candidate equi-join -> bounded edit-distance score ->
    deterministic best-match pick -> accuracy audit

Scale shape: candidates are generated ONLY by an equi-join on a blocking
key (here `(c_nationkey, c_mktsegment)` — block sizes are |customers| /
125 and stay bounded as the table grows because new nations/segments
arrive with new data; production adds more blocking passes, never a
cartesian). Scoring is `levenshtein` inside whole-stage codegen; the
best-match pick is a window-min + filter (no collect). The dirty side is
derived deterministically from the clean side (a one-char deletion in the
numeric tail) so the true link is known and the query can report
accuracy — the same generate-then-audit pattern as the medallion
generator (medallion/generate.py).

Cross-engine exactness: edit distance is integer; ties are broken by
(distance, custkey) min-struct, total and deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from energy_emissions_lakehouse_spark.registry import register
from energy_emissions_lakehouse_spark.tables import t

#: Dirty subset: every 7th customer (offset 3); deletion position inside
#: the 9-digit numeric tail of ``Customer#%09d`` (name length 18).
DIRTY_MOD = 7
DIRTY_REM = 3
MAX_EDIT_DIST = 2

_DIRTY_SQL = f"""
    dirty AS (
      SELECT c_custkey AS src_key, c_nationkey, c_mktsegment,
             substr(c_name, 1, 9 + (c_custkey % 8))
               || substr(c_name, 11 + (c_custkey % 8)) AS dirty_name
      FROM customer
      WHERE c_custkey % {DIRTY_MOD} = {DIRTY_REM}
    )
"""


@register(
    "entity_resolution_customers",
    oracle=f"""
    WITH {_DIRTY_SQL},
    cand AS (
      SELECT d.src_key, c.c_custkey AS cand_key,
             CAST(levenshtein(d.dirty_name, c.c_name) AS BIGINT) AS dist
      FROM dirty d
      JOIN customer c
        ON d.c_nationkey = c.c_nationkey
       AND d.c_mktsegment = c.c_mktsegment
      WHERE levenshtein(d.dirty_name, c.c_name) <= {MAX_EDIT_DIST}
    ),
    best AS (
      SELECT src_key, cand_key, dist,
             MIN(dist) OVER (PARTITION BY src_key) AS best_dist
      FROM cand
    ),
    picked AS (
      SELECT src_key, best_dist,
             CAST(MIN(cand_key) AS BIGINT) AS best_key,
             CAST(COUNT(*) AS BIGINT) AS n_tied
      FROM best WHERE dist = best_dist
      GROUP BY src_key, best_dist
    )
    SELECT best_dist,
           CAST(COUNT(*) AS BIGINT) AS n_matched,
           CAST(SUM(CASE WHEN best_key = src_key THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           CAST(SUM(n_tied) AS BIGINT) AS n_candidates_at_best
    FROM picked
    GROUP BY best_dist
    ORDER BY best_dist
    """,
    survey="extension (entity resolution): block -> candidate equi-join -> "
    "levenshtein<=2 -> deterministic best-match -> accuracy audit over "
    "the customer dimension. Blocking on (nationkey, mktsegment) keeps "
    "candidate generation an equi-join (never cartesian); dirty records "
    "derived deterministically so the true link is known. No reference "
    "analog (load_to_postgres.py assumes clean natural keys)",
    tags=("linkage",),
)
def entity_resolution_customers(spark, sf_dir) -> DataFrame:
    """Link one-char-corrupted customer names back to the dimension.

    Returns (best_dist, n_matched, n_correct, n_candidates_at_best): how
    many dirty records resolved at each edit distance, how many picked
    the true source row, and how ambiguous the best tier was."""
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    dirty = cust.filter(
        F.col("c_custkey") % DIRTY_MOD == DIRTY_REM
    ).select(
        F.col("c_custkey").alias("src_key"),
        F.col("c_nationkey").alias("d_nationkey"),
        F.col("c_mktsegment").alias("d_mktsegment"),
        F.concat(
            F.expr("substr(c_name, 1, 9 + (c_custkey % 8))"),
            F.expr("substr(c_name, 11 + (c_custkey % 8))"),
        ).alias("dirty_name"),
    )
    cand = (
        dirty.join(
            cust,
            (dirty.d_nationkey == cust.c_nationkey)
            & (dirty.d_mktsegment == cust.c_mktsegment),
        )
        .select(
            "src_key",
            F.col("c_custkey").alias("cand_key"),
            F.levenshtein("dirty_name", "c_name").cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= MAX_EDIT_DIST)
    )
    w = Window.partitionBy("src_key")
    best = cand.withColumn("best_dist", F.min("dist").over(w)).filter(
        F.col("dist") == F.col("best_dist")
    )
    picked = best.groupBy("src_key", "best_dist").agg(
        F.min("cand_key").cast("long").alias("best_key"),
        F.count(F.lit(1)).cast("long").alias("n_tied"),
    )
    return (
        picked.groupBy("best_dist")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.sum(
                F.when(F.col("best_key") == F.col("src_key"), 1).otherwise(0)
            ).cast("long").alias("n_correct"),
            F.sum("n_tied").cast("long").alias("n_candidates_at_best"),
        )
        .orderBy("best_dist")
    )
