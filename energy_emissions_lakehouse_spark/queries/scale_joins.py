"""Scale-path join strategies beyond the reference's equi-join surface.

Two operators a 100 TB deployment leans on that the reference (all joins
equi, SURVEY.md §2.5) never needed:

- **Bucketed co-located join** — both sides pre-written with
  ``bucketBy(k, join_key)``; the sort-merge join then reads bucket i of each
  side into the same task and NO shuffle of either fact occurs at query
  time. This is the Spark analog of the reference's Postgres btree indexes
  (SQL/01_create_schema.sql:56-58): physical design paid once at write
  time, amortized over every subsequent join. At 100 TB the avoided
  exchange is the difference between a join that runs and one that spills.
- **Banded range join** — Spark has no native interval-join optimization,
  so a raw ``a.ts BETWEEN b.ts AND b.ts + 1h`` predicate degenerates to
  BroadcastNestedLoop/cartesian. The scalable rewrite quantizes time into
  buckets the width of the band and equi-joins on (key, bucket) with the
  left side exploded to its two candidate buckets — candidate generation is
  a plain hash join, and the exact predicate filters the small candidate
  set. Pair volume scales with actual matches, never |A| x |B|.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from energy_emissions_lakehouse_spark.functions.exact import scaled_sum, scaled_sum_sql
from energy_emissions_lakehouse_spark.fsutil import user_staging_root
from energy_emissions_lakehouse_spark.registry import register
from energy_emissions_lakehouse_spark.tables import t

N_BUCKETS = 8
BAND_SECONDS = 3600

_BUCKET_ROOT = os.path.join(user_staging_root(), "bucketed")
#: (session id, sf tag) pairs whose bucketed tables are already written.
_BUCKETED: set[tuple[int, str]] = set()


def _sf_tag(sf_dir: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", os.path.basename(sf_dir.rstrip("/")))


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Expose customer + orders as bucketed catalog tables and return their
    names. The parquet bucket files are written ONCE per scale factor
    (cross-process, on disk); later sessions only re-register the catalog
    entry with ``CREATE TABLE ... CLUSTERED BY`` over the existing files —
    a metadata-only operation, so the driver's per-query cost is a scan,
    not a staging rewrite.

    Physical design: ``bucketBy(N_BUCKETS, custkey).sortBy(custkey)`` on
    both sides — matching bucket counts on the join key let the sort-merge
    join consume the scans with no Exchange on either side.
    """
    tag = _sf_tag(sf_dir)
    cust_tbl, ord_tbl = f"eel_cust_b_{tag}", f"eel_ord_b_{tag}"
    key = (id(spark), tag)
    if key in _BUCKETED:
        return cust_tbl, ord_tbl
    for tbl, df, bucket_col in (
        (cust_tbl, t(spark, sf_dir, "customer"), "c_custkey"),
        (ord_tbl, t(spark, sf_dir, "orders"), "o_custkey"),
    ):
        path = os.path.join(_BUCKET_ROOT, tag, tbl)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            # Files already staged by an earlier session: register an
            # external bucketed table over them (no data rewrite). Spark
            # recovers each file's bucket id from its name.
            cols = ", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
            )
            spark.sql(
                f"CREATE TABLE {tbl} ({cols}) USING PARQUET "
                f"CLUSTERED BY ({bucket_col}) SORTED BY ({bucket_col}) "
                f"INTO {N_BUCKETS} BUCKETS LOCATION '{path}'"
            )
        else:
            (
                df.write.format("parquet")
                .mode("overwrite")
                .bucketBy(N_BUCKETS, bucket_col)
                .sortBy(bucket_col)
                .option("path", path)
                .saveAsTable(tbl)
            )
    _BUCKETED.add(key)
    return cust_tbl, ord_tbl


@register(
    "bucketed_join_revenue_by_segment",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*)                            AS n_orders,
           {scaled_sum_sql('o.o_totalprice')}  AS sum_totalprice
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    survey="extension (physical design): bucketed co-located sort-merge join "
    "— bucketBy(8, custkey) on both sides removes the join-time shuffle "
    "entirely (no Exchange on c_custkey/o_custkey, asserted in "
    "tests/test_plan_quality.py); the write-once analog of the reference's "
    "btree indexes (SQL/01_create_schema.sql:56-58)",
)
def bucketed_join_revenue_by_segment(spark, sf_dir) -> DataFrame:
    """Revenue by market segment over pre-bucketed facts. The ``merge`` hint
    pins sort-merge (a broadcast would hide the bucketing win at test scale);
    the only Exchange left in the plan is the final tiny segment rollup."""
    cust_tbl, ord_tbl = _bucketed_tables(spark, sf_dir)
    c = spark.table(cust_tbl).hint("merge")
    o = spark.table(ord_tbl)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            scaled_sum(F.col("o_totalprice")).alias("sum_totalprice"),
        )
    )


@register(
    "range_join_event_pairs_1h",
    oracle=f"""
    SELECT a.user_id,
           COUNT(*) AS n_pairs,
           CAST(SUM(DATE_DIFF('second', a.ts, b.ts)) AS BIGINT) AS sum_delta_s,
           CAST(MAX(DATE_DIFF('second', a.ts, b.ts)) AS BIGINT) AS max_delta_s
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND DATE_DIFF('second', a.ts, b.ts) > 0
     AND DATE_DIFF('second', a.ts, b.ts) <= {BAND_SECONDS}
    GROUP BY a.user_id
    """,
    survey="extension (custom operator): banded range/interval join — "
    "time quantized to band-width buckets, left side exploded to its two "
    "candidate buckets, equi-join on (user_id, bucket), exact interval "
    "predicate on the candidates; no cartesian anywhere (plan-audited). "
    "The reference has no theta/range joins (SURVEY §2.5)",
)
def range_join_event_pairs_1h(spark, sf_dir) -> DataFrame:
    """Per-user ordered event pairs within a 1-hour band.

    Why two candidate buckets suffice: with bucket = floor(epoch/W) and
    0 < delta <= W, the later event's bucket is either the earlier's or the
    next one — so the exploded equi-join is lossless and duplicate-free.
    Deltas are whole seconds (unix_timestamp floors; DuckDB's
    DATE_DIFF('second') counts the same boundary crossings), keeping the
    aggregate integer-exact cross-engine.
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp("ts").alias("epoch_s"),
    )
    w = F.lit(BAND_SECONDS)
    left = ev.select(
        F.col("user_id"),
        F.col("epoch_s").alias("a_s"),
        F.explode(
            F.array(
                (F.col("epoch_s") / w).cast("long"),
                (F.col("epoch_s") / w).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    right = ev.select(
        F.col("user_id"),
        F.col("epoch_s").alias("b_s"),
        (F.col("epoch_s") / w).cast("long").alias("bucket"),
    )
    delta = F.col("b_s") - F.col("a_s")
    return (
        left.join(right, ["user_id", "bucket"])
        .filter((delta > 0) & (delta <= w))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(delta).alias("sum_delta_s"),
            F.max(delta).alias("max_delta_s"),
        )
    )
