"""Core relational operator inventory over the TPC-H-ish testdata.

Each query exercises specific operators from SURVEY.md §2 (ids in the
``survey=`` argument) and ships a DuckDB oracle that is engineered to match
the Spark result bit-for-bit (see registry.py for the exactness policy).

Scale notes are inline per query: broadcast hints on dimension-sized tables,
no driver-side collects, aggregation-before-join where cardinality allows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from energy_emissions_lakehouse_spark.functions.exact import (
    scaled_avg,
    scaled_avg_sql,
    scaled_sum,
    scaled_sum_sql,
)
from energy_emissions_lakehouse_spark.registry import register
from energy_emissions_lakehouse_spark.tables import TABLES, t


def _partitioned_orders_path(spark, sf_dir: str) -> str:
    """Orders staged as a year-partitioned parquet table (the MERGE target).
    Built once per scale factor (cross-process, _SUCCESS-gated); the merge
    query then operates on a real partitioned table, like a production
    warehouse, not a temp view."""
    import hashlib
    import os
    import re

    from energy_emissions_lakehouse_spark.fsutil import staging_dir

    tag = re.sub(r"[^A-Za-z0-9_]", "_", os.path.basename(sf_dir.rstrip("/")))
    # key on the source file's mtime+size: testdata is regenerated between
    # rounds at the same path, and a stale staged copy would silently feed
    # the merge queries old rows (same lesson as streaming._stage_key)
    st = os.stat(os.path.join(sf_dir, "orders.parquet"))
    fresh = hashlib.md5(f"{st.st_mtime_ns}:{st.st_size}".encode()).hexdigest()[:12]
    path = os.path.join(
        staging_dir("merge"), f"{tag}-{fresh}", "orders_by_year"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            t(spark, sf_dir, "orders")
            .withColumn("o_year", F.year("o_orderdate").cast("long"))
            .write.mode("overwrite")
            .partitionBy("o_year")
            .parquet(path)
        )
    return path


# --------------------------------------------------------------------------
# Aggregation / filter / sort
# --------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity)                                            AS sum_qty,
           {scaled_sum_sql('l_extendedprice')}                        AS sum_base_price,
           {scaled_sum_sql('l_extendedprice * (1.0 - l_discount)')}   AS sum_disc_price,
           SUM(l_quantity) / CAST(COUNT(*) AS DOUBLE)                 AS avg_qty,
           {scaled_avg_sql('l_extendedprice')}                        AS avg_price,
           COUNT(*)                                                   AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey="A1 A2 F1 O1 P10 P11 — grouped multi-aggregate with filter "
    "(silver_to_gold.py:37-45; SQL/03_analysis_queries.sql:49-55)",
)
def pricing_summary(spark, sf_dir) -> DataFrame:
    """TPC-H Q1-shaped rollup: map-side partial agg then single shuffle on the
    (tiny-cardinality) group key — the canonical scalable aggregation plan."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("2000-09-02 00:00:00"))
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        scaled_sum(F.col("l_extendedprice")).alias("sum_base_price"),
        scaled_sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
            "sum_disc_price"
        ),
        (F.sum("l_quantity") / F.count(F.lit(1)).cast("double")).alias("avg_qty"),
        scaled_avg(F.col("l_extendedprice")).alias("avg_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "star_join_revenue",
    oracle=f"""
    SELECT r.r_name,
           CAST(YEAR(o.o_orderdate) AS BIGINT)                        AS order_year,
           {scaled_sum_sql('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue,
           COUNT(*)                                                   AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, CAST(YEAR(o.o_orderdate) AS BIGINT)
    """,
    survey="J4 J5 P4 A3 — star join fact->dims with broadcast "
    "(SQL/03_analysis_queries.sql:21-23,38-40)",
)
def star_join_revenue(spark, sf_dir) -> DataFrame:
    """Fact-to-dims star join. nation/region are broadcast explicitly;
    customer stays hash-joined (at 100 TB customer is ~15 GB — too big to
    broadcast, co-partitioned by key with AQE picking the strategy)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            scaled_sum(rev).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "avg_price_by_part_type",
    oracle=f"""
    SELECT p.p_type,
           {scaled_avg_sql('l.l_extendedprice')} AS avg_price,
           COUNT(*)                              AS n_items
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_type
    """,
    survey="J5 A5 O3 P10 — dim join + grouped avg + round "
    "(SQL/03_analysis_queries.sql:49-55)",
)
def avg_price_by_part_type(spark, sf_dir) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    # part is a dimension (200k rows at sf=1) — broadcast to avoid
    # shuffling the fact table.
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type")
        .agg(
            scaled_avg(F.col("l_extendedprice")).alias("avg_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "quantity_range_summary",
    oracle="""
    SELECT l_returnflag,
           COUNT(*)                                       AS n_rows,
           SUM(l_quantity)                                AS sum_qty,
           SUM(GREATEST(0.0, l_quantity - 15.0))          AS sum_over_15
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
    GROUP BY l_returnflag
    """,
    survey="F1 P9 A1 — null-rejecting BETWEEN + greatest clamp "
    "(bronze_to_silver.py:35-36; generate_energy_emissions.py:55,85)",
)
def quantity_range_summary(spark, sf_dir) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity").between(10, 20))
    # l_quantity is integer-valued: plain double sums are exact (< 2^53).
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
        F.sum(F.greatest(F.lit(0.0), F.col("l_quantity") - F.lit(15.0))).alias(
            "sum_over_15"
        ),
    )


@register(
    "median_quantity_by_flag",
    oracle="""
    SELECT l_returnflag,
           MEDIAN(l_quantity)            AS median_qty,
           QUANTILE_CONT(l_quantity, 0.9) AS p90_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey="A8 — exact median/percentile (bronze_to_silver.py:39,69); exact "
    "`percentile`, NOT percentile_approx, per SURVEY §4",
)
def median_quantity_by_flag(spark, sf_dir) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile(F.col("l_quantity"), F.lit(0.5)).alias("median_qty"),
        F.percentile(F.col("l_quantity"), F.lit(0.9)).alias("p90_qty"),
    )


@register(
    "price_per_unit_by_year",
    oracle=f"""
    SELECT CAST(YEAR(o.o_orderdate) AS BIGINT)              AS order_year,
           {scaled_sum_sql('l.l_extendedprice')}            AS total_price,
           SUM(l.l_quantity)                                AS total_qty,
           ROUND({scaled_sum_sql('l.l_extendedprice')}
                 / NULLIF(SUM(l.l_quantity), 0), 6)         AS price_per_unit
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY CAST(YEAR(o.o_orderdate) AS BIGINT)
    """,
    survey="P7 J1 A3 P4 — inner equi-join + totals + null-safe division "
    "(silver_to_gold.py:64-84)",
)
def price_per_unit_by_year(spark, sf_dir) -> DataFrame:
    """carbon_intensity-shaped KPI: totals joined then null-safe ratio
    (0-divisor -> null, silver_to_gold.py:81-84)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    agg = joined.groupBy(F.year("o_orderdate").cast("long").alias("order_year")).agg(
        scaled_sum(F.col("l_extendedprice")).alias("total_price"),
        F.sum("l_quantity").alias("total_qty"),
    )
    return agg.withColumn(
        "price_per_unit",
        F.round(F.col("total_price") / F.nullif(F.col("total_qty"), F.lit(0)), 6),
    )


@register(
    "monthly_revenue_1998",
    oracle=f"""
    SELECT CAST(MONTH(o_orderdate) AS BIGINT)   AS order_month,
           COUNT(*)                             AS n_orders,
           {scaled_sum_sql('o_totalprice')}     AS revenue
    FROM orders
    WHERE YEAR(o_orderdate) = 1998
    GROUP BY CAST(MONTH(o_orderdate) AS BIGINT)
    """,
    survey="F3 A7 P4 — equality filter + BI-style monthly sum "
    "(SQL/03_analysis_queries.sql:88; PBIX visuals)",
)
def monthly_revenue_1998(spark, sf_dir) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1998)
    return orders.groupBy(
        F.month("o_orderdate").cast("long").alias("order_month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        scaled_sum(F.col("o_totalprice")).alias("revenue"),
    )


@register(
    "lineitem_null_audit",
    oracle="""
    SELECT """
    + ",\n           ".join(
        f"COUNT(CASE WHEN {c} IS NULL THEN 1 END) AS null_{c}"
        for c in (
            "l_orderkey",
            "l_partkey",
            "l_quantity",
            "l_extendedprice",
            "l_returnflag",
            "l_shipdate",
        )
    )
    + """
    FROM lineitem
    """,
    survey="Q1 F5 A6 — fail-fast null audit (load_to_postgres.py:182-187; "
    "SQL/03_analysis_queries.sql:71-76)",
)
def lineitem_null_audit(spark, sf_dir) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    cols = [
        "l_orderkey",
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
        "l_shipdate",
    ]
    return li.agg(
        *[
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"null_{c}")
            for c in cols
        ]
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@register(
    "top_orders_per_priority",
    oracle="""
    SELECT * FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        FROM orders
    ) WHERE rn <= 5
    """,
    survey="W1 W2 F4 O2 — ROW_NUMBER top-K per group "
    "(SQL/03_analysis_queries.sql:28-45)",
)
def top_orders_per_priority(spark, sf_dir) -> DataFrame:
    """Top-K per group. o_orderkey tiebreak makes ranking total, so the
    result is deterministic across engines and shuffles."""
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 5)
    )


@register(
    "revenue_growth_by_month",
    oracle=f"""
    WITH monthly AS (
        SELECT CAST(YEAR(o_orderdate) AS BIGINT)  AS y,
               CAST(MONTH(o_orderdate) AS BIGINT) AS m,
               {scaled_sum_sql('o_totalprice')}   AS revenue
        FROM orders
        GROUP BY 1, 2
    )
    SELECT y, m, revenue,
           LAG(revenue) OVER (ORDER BY y, m)           AS prev_revenue,
           revenue - LAG(revenue) OVER (ORDER BY y, m) AS growth
    FROM monthly
    """,
    survey="extension (timeseries): LAG over monthly rollup — beyond the "
    "reference's ranking-only window surface (SURVEY §2.7)",
)
def revenue_growth_by_month(spark, sf_dir) -> DataFrame:
    """Analytic window over an 84-row aggregate: the unpartitioned window is
    fine because it runs on post-aggregation (tiny) data, never on the fact."""
    orders = t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
    ).agg(scaled_sum(F.col("o_totalprice")).alias("revenue"))
    w = Window.orderBy("y", "m")
    return monthly.select(
        "y",
        "m",
        "revenue",
        F.lag("revenue").over(w).alias("prev_revenue"),
        (F.col("revenue") - F.lag("revenue").over(w)).alias("growth"),
    )


@register(
    "first_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey AS first_orderkey,
           o_orderdate AS first_orderdate, o_totalprice AS first_totalprice
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
    survey="D2 — deterministic dedup-by-key (keep first by sort order), "
    "load_to_postgres.py:45; made total via the o_orderkey tiebreak",
)
def first_order_per_customer(spark, sf_dir) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("first_orderkey"),
            F.col("o_orderdate").alias("first_orderdate"),
            F.col("o_totalprice").alias("first_totalprice"),
        )
    )


# --------------------------------------------------------------------------
# Dedup / distinct / set ops / sampling
# --------------------------------------------------------------------------


@register(
    "dedup_exact_rows",
    oracle="""
    SELECT DISTINCT l_orderkey, l_linenumber, l_quantity
    FROM (
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE (l_orderkey % 13) = 0
    )
    WHERE (l_orderkey % 3) = 0
    """,
    survey="D1 U2 — full-row exact dedup after duplicate injection "
    "(bronze_to_silver.py:21,53; generate_energy_emissions.py:113-116)",
)
def dedup_exact_rows(spark, sf_dir) -> DataFrame:
    """Exact dedup = hash-shuffle on all columns; at 100 TB prefer
    dropDuplicates on a strong row-hash column to shrink shuffle width."""
    base = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    dupes = base.filter((F.col("l_orderkey") % 13) == 0)
    return (
        base.unionByName(dupes)
        .filter((F.col("l_orderkey") % 3) == 0)
        .dropDuplicates()
    )


@register(
    "distinct_segments",
    oracle="SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    survey="D3 O6 — sorted distinct of one column (load_to_postgres.py:21)",
)
def distinct_segments(spark, sf_dir) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .select("c_mktsegment")
        .distinct()
        .orderBy("c_mktsegment")
    )


@register(
    "nation_presence_union",
    oracle="""
    SELECT n.n_name
    FROM (
        SELECT c_nationkey AS k FROM customer
        UNION
        SELECT s_nationkey AS k FROM supplier
    ) keys
    JOIN nation n ON n.n_nationkey = keys.k
    ORDER BY n.n_name
    """,
    survey="U3 D4 — distinct union of keys across tables + dim join "
    "(load_to_postgres.py:138-141)",
)
def nation_presence_union(spark, sf_dir) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    supplier = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    keys = (
        customer.select(F.col("c_nationkey").alias("k"))
        .union(supplier.select(F.col("s_nationkey").alias("k")))
        .distinct()
    )
    return (
        keys.join(F.broadcast(nation), keys.k == nation.n_nationkey)
        .select("n_name")
        .orderBy("n_name")
    )


@register(
    "table_row_counts",
    oracle="\n    UNION ALL ".join(
        f"SELECT '{name}' AS table_name, COUNT(*) AS n_rows FROM {name}"
        for name in TABLES
    ),
    survey="U1 A4 Q2 — per-table row-count report "
    "(SQL/03_analysis_queries.sql:2-10)",
)
def table_row_counts(spark, sf_dir) -> DataFrame:
    counts = [
        t(spark, sf_dir, name).agg(
            F.lit(name).alias("table_name"), F.count(F.lit(1)).alias("n_rows")
        )
        for name in TABLES
    ]
    return reduce(DataFrame.unionByName, counts)


@register(
    "deterministic_sample_stats",
    oracle="""
    SELECT l_linestatus, COUNT(*) AS n_rows, SUM(l_quantity) AS sum_qty
    FROM lineitem
    WHERE ((l_orderkey * 7919 + l_linenumber) % 100) < 2
    GROUP BY l_linestatus
    """,
    survey="R1 — seeded sampling (generate_energy_emissions.py:114). "
    "Implemented as modular key selection: deterministic cross-engine, unlike "
    "Bernoulli sample(); at scale it is a pushed-down filter, no shuffle.",
)
def deterministic_sample_stats(spark, sf_dir) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        ((F.col("l_orderkey") * 7919 + F.col("l_linenumber")) % 100) < 2
    )
    return li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("l_quantity").alias("sum_qty")
    )


@register(
    "count_distinct_parts_by_flag",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*)                  AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey="extension: distinct aggregate (SURVEY §2.6 notes none exist in "
    "the reference); the approx variant is `approx_distinct_parts` (rows-only)",
)
def count_distinct_parts_by_flag(spark, sf_dir) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "approx_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS approx_within_6pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey="extension: approx_count_distinct (HLL) — the 100 TB path where "
    "exact distinct would shuffle the full key set. Deterministic-verdict "
    "oracle: the exact count hash-matches DuckDB and the boolean pins the "
    "estimate within 3*rsd of it, so a sketch regression fails the driver "
    "check instead of hiding behind a rows-only row",
)
def approx_distinct_parts(spark, sf_dir) -> DataFrame:
    """Sketch family and exact family run as SEPARATE aggregations joined
    on the 3-value group key: fusing a DISTINCT aggregate with the HLL
    sketch plans as a two-phase aggregate that carries the FULL partial
    HLL register state (410 MS[..] columns) keyed on (l_returnflag,
    l_partkey) through the distinct Exchange — a 412-column shuffle of
    the whole distinct key set (the round-12 before-plan; no Expand node
    is involved, per the round-12 verdict's correction) — measured
    1.58 s fused vs 0.89 s split at sf0.1 local[32] (the same trap
    analyze_table_stats documents for its 6-column form). The tiny
    sketch side is broadcast, so the plan is two scans + one zero-shuffle
    join; only the exact value plus the bounded-error verdict are emitted
    so the result is cross-engine deterministic.

    Non-null group key REQUIRED (round-12 advice): the inner equi-join
    drops a NULL group (null != null) that the fused single aggregation
    would have emitted.  l_returnflag is non-null by the TPC-H contract;
    copying this split-aggregation pattern to a nullable key needs
    eqNullSafe join conditions."""
    li = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_partkey")
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("_approx")
    )
    return exact.join(F.broadcast(approx), "l_returnflag").select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("_approx") - F.col("exact_parts"))
            <= F.greatest(
                F.lit(1).cast("double"),
                F.col("exact_parts") * F.lit(0.06),
            )
        ).alias("approx_within_6pct"),
    )


# --------------------------------------------------------------------------
# Joins beyond the star
# --------------------------------------------------------------------------


@register(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    survey="J2 J3 S8 — left anti join / insert-if-missing pattern "
    "(load_to_postgres.py:29-35,48-54)",
)
def customers_without_orders(spark, sf_dir) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "customers_without_urgent_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT'
    )
    """,
    survey="J2 J3 S8 — left anti join / insert-if-missing pattern "
    "(load_to_postgres.py:29-35,48-54). Guaranteed-non-empty variant of "
    "customers_without_orders, which matches 0 rows in this testdata "
    "(every customer has orders) and so verified the anti-join value path "
    "vacuously. Qualifying the right side to URGENT orders leaves a "
    "scale-stable ~13% of customers (18 @sf0.001, 203 @sf0.01, 1986 "
    "@sf0.1) in the result, so the driver's hash check exercises real rows",
)
def customers_without_urgent_orders(spark, sf_dir) -> DataFrame:
    """Anti join against a priority-filtered right side. The filter is
    pushed into the orders scan before the join build; the join itself
    shuffles only custkeys (or broadcasts the filtered side when small)."""
    customer = t(spark, sf_dir, "customer")
    urgent = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "customer_segment_activity",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_active_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
    survey="extension: left semi join (reference has only anti, SURVEY §2.5)",
)
def customer_segment_activity(spark, sf_dir) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_active_customers"))
    )


@register(
    "region_status_cross",
    oracle="""
    SELECT r.r_name, s.o_orderstatus
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
    survey="J7 S9 — cross join (generator grid, "
    "generate_energy_emissions.py:39-96)",
)
def region_status_cross(spark, sf_dir) -> DataFrame:
    region = t(spark, sf_dir, "region")
    statuses = t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return region.crossJoin(statuses).select("r_name", "o_orderstatus")


@register(
    "merge_upsert_orders",
    oracle=f"""
    WITH updates AS (
        SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
               o_totalprice * 1.1 AS o_totalprice, o_orderdate, o_orderpriority
        FROM orders WHERE (o_orderkey % 10) = 0
    ),
    merged AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM updates u
                          WHERE u.o_orderkey = o.o_orderkey)
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM updates
    )
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           {scaled_sum_sql('o_totalprice')} AS total_price
    FROM merged
    GROUP BY o_orderstatus
    """,
    survey="S7 S8 — idempotent upsert: MERGE semantics as anti-join + union "
    "(load_to_postgres.py:73-117); on Delta this is DeltaTable.merge",
)
def merge_upsert_orders(spark, sf_dir) -> DataFrame:
    """Upsert expressed relationally (source wins on key conflict). The
    same helper backs the warehouse load; Delta MERGE replaces it when a
    transactional table format is available."""
    from energy_emissions_lakehouse_spark.operators.merge import upsert

    orders = t(spark, sf_dir, "orders")
    updates = orders.filter((F.col("o_orderkey") % 10) == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * F.lit(1.1)).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    merged = upsert(target=orders, source=updates, keys=["o_orderkey"])
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        scaled_sum(F.col("o_totalprice")).alias("total_price"),
    )


@register(
    "merge_upsert_orders_partition_scoped",
    oracle=f"""
    WITH updates AS (
        SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
               o_totalprice * 1.1 AS o_totalprice, o_orderdate, o_orderpriority
        FROM orders
        WHERE (o_orderkey % 10) = 0 AND YEAR(o_orderdate) = 1995
    ),
    merged AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM updates u
                          WHERE u.o_orderkey = o.o_orderkey)
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM updates
    )
    SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year, o_orderstatus,
           COUNT(*) AS n_orders,
           {scaled_sum_sql('o_totalprice')} AS total_price
    FROM merged
    GROUP BY o_year, o_orderstatus
    """,
    survey="S7 — partition-scoped MERGE: the 100 TB physical design. Target "
    "parquet partitioned by order year; the delta touches ONE year, and "
    "dynamic partition overwrite rewrites only that partition directory "
    "(untouched-partition preservation is asserted file-level in "
    "tests/test_operators.py). Replaces round 1's full-table rewrite "
    "(load_to_postgres.py:73-117; on Delta/Iceberg this is MERGE INTO)",
)
def merge_upsert_orders_partition_scoped(spark, sf_dir) -> DataFrame:
    """Stage orders partitioned by year, merge a single-year delta via
    dynamic partition overwrite, then aggregate the WHOLE post-merge table
    (untouched years included — corrupting any partition breaks parity)."""
    from energy_emissions_lakehouse_spark.operators.merge import (
        upsert_partition_scoped,
    )

    path = _partitioned_orders_path(spark, sf_dir)
    orders = t(spark, sf_dir, "orders")
    updates = (
        orders.filter(
            ((F.col("o_orderkey") % 10) == 0)
            & (F.year("o_orderdate") == 1995)
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.lit("U").alias("o_orderstatus"),
            (F.col("o_totalprice") * F.lit(1.1)).alias("o_totalprice"),
            "o_orderdate",
            "o_orderpriority",
        )
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
    )
    upsert_partition_scoped(
        spark, path, updates, keys=["o_orderkey"], partition_col="o_year"
    )
    merged = spark.read.parquet(path)
    return merged.groupBy(
        F.col("o_year").cast("long").alias("o_year"), "o_orderstatus"
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        scaled_sum(F.col("o_totalprice")).alias("total_price"),
    )


# --------------------------------------------------------------------------
# OLAP extensions: multi-dimensional aggregates, outer joins, pivot, windows
# --------------------------------------------------------------------------


@register(
    "rollup_revenue_by_year_flag",
    oracle=f"""
    SELECT CAST(YEAR(l_shipdate) AS BIGINT) AS ship_year, l_returnflag,
           {scaled_sum_sql('l_extendedprice * (1.0 - l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY ROLLUP (CAST(YEAR(l_shipdate) AS BIGINT), l_returnflag)
    """,
    survey="extension (OLAP): ROLLUP hierarchy subtotals — one shuffle, "
    "Spark expands grouping sets map-side (no reference analog, SURVEY §2.6)",
)
def rollup_revenue_by_year_flag(spark, sf_dir) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.rollup(F.year("l_shipdate").cast("long").alias("ship_year"), "l_returnflag")
        .agg(scaled_sum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    survey="extension (OLAP): CUBE over two dimensions — all 4 grouping "
    "sets in one pass",
)
def cube_status_priority(spark, sf_dir) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "left_outer_order_linecount",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN l.cnt IS NULL THEN 0 ELSE l.cnt END) AS BIGINT)
               AS n_lineitems,
           COUNT(CASE WHEN l.cnt IS NULL THEN 1 END) AS n_empty_orders
    FROM orders o
    LEFT JOIN (SELECT l_orderkey, COUNT(*) AS cnt
               FROM lineitem GROUP BY l_orderkey) l
      ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
    survey="extension (joins): LEFT OUTER with pre-aggregated build side — "
    "aggregate-before-join keeps the shuffled payload to one row per key "
    "(reference has no outer joins, SURVEY §2.5)",
)
def left_outer_order_linecount(spark, sf_dir) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    li_counts = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    joined = orders.join(
        li_counts, orders.o_orderkey == li_counts.l_orderkey, "left_outer"
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("n_lineitems"),
        F.count(F.when(F.col("cnt").isNull(), 1)).alias("n_empty_orders"),
    )


@register(
    "full_outer_nation_presence",
    oracle="""
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(c.n_customers, 0) AS n_customers,
           COALESCE(s.n_suppliers, 0) AS n_suppliers
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_customers
          FROM customer GROUP BY c_nationkey) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
          FROM supplier GROUP BY s_nationkey) s
      ON c.nk = s.nk
    """,
    survey="extension (joins): FULL OUTER over grouped sides with COALESCE "
    "key recovery",
)
def full_outer_nation_presence(spark, sf_dir) -> DataFrame:
    cust = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return cust.join(supp, cust.c_nk == supp.s_nk, "full_outer").select(
        F.coalesce(F.col("c_nk"), F.col("s_nk")).alias("nationkey"),
        F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
        F.coalesce(F.col("n_suppliers"), F.lit(0)).alias("n_suppliers"),
    )


@register(
    "pivot_revenue_by_flag",
    oracle=f"""
    SELECT CAST(YEAR(l_shipdate) AS BIGINT) AS ship_year,
           {scaled_sum_sql("CASE WHEN l_returnflag = 'A' THEN l_extendedprice ELSE NULL END")} AS flag_a,
           {scaled_sum_sql("CASE WHEN l_returnflag = 'N' THEN l_extendedprice ELSE NULL END")} AS flag_n,
           {scaled_sum_sql("CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE NULL END")} AS flag_r
    FROM lineitem
    GROUP BY CAST(YEAR(l_shipdate) AS BIGINT)
    """,
    survey="extension (OLAP): pivot (wide conditional aggregation) — "
    "explicit value list so the plan is a single pass, no distinct-scan",
)
def pivot_revenue_by_flag(spark, sf_dir) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    # Explicit pivot values: skips Spark's extra distinct-collection job and
    # keeps output schema static (required for the driver contract anyway).
    return (
        li.groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(scaled_sum(F.col("l_extendedprice")))
        .select(
            "ship_year",
            F.col("A").alias("flag_a"),
            F.col("N").alias("flag_n"),
            F.col("R").alias("flag_r"),
        )
    )


@register(
    "customer_balance_quartiles",
    oracle="""
    SELECT c_mktsegment, quartile, COUNT(*) AS n_customers,
           MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
    FROM (
        SELECT c_mktsegment, c_acctbal,
               CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
                    ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
        FROM customer
    )
    GROUP BY c_mktsegment, quartile
    """,
    survey="extension (windows): NTILE bucketing with a unique tiebreaker "
    "(total order -> deterministic cross-engine); partitioned by segment — "
    "an unpartitioned NTILE over a fact-sized table would single-partition "
    "at scale (caught by the plan audit in tests/test_plan_quality.py)",
)
def customer_balance_quartiles(spark, sf_dir) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        cust.select(
            "c_mktsegment",
            "c_acctbal",
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
        .groupBy("c_mktsegment", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


@register(
    "running_monthly_revenue",
    oracle=f"""
    WITH monthly AS (
        SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
               CAST(MONTH(o_orderdate) AS BIGINT) AS order_month,
               SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
        FROM orders
        GROUP BY 1, 2
    )
    SELECT order_year, order_month,
           CAST(SUM(cents) OVER (
               PARTITION BY order_year ORDER BY order_month
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 100.0 AS cumulative_revenue
    FROM monthly
    """,
    survey="extension (windows): aggregate-over-frame (running cumulative "
    "sum) — ROWS frame on pre-rounded integer cents so the running values "
    "are order-exact in both engines",
)
def running_monthly_revenue(spark, sf_dir) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents")
    )
    w = (
        Window.partitionBy("order_year")
        .orderBy("order_month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return monthly.select(
        "order_year",
        "order_month",
        (F.sum("cents").over(w).cast("double") / F.lit(100.0)).alias(
            "cumulative_revenue"
        ),
    )


@register(
    "part_types_per_brand",
    oracle="""
    SELECT p_brand,
           COUNT(DISTINCT p_type) AS n_types,
           array_to_string(list_sort(list_distinct(list(p_type))), '|')
               AS types_sorted
    FROM part
    GROUP BY p_brand
    """,
    survey="extension (aggregates): collect_set + sorted array join — "
    "string-serialized so the comparison is engine-neutral (array reprs "
    "differ between pandas/duckdb)",
)
def part_types_per_brand(spark, sf_dir) -> DataFrame:
    part = t(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.countDistinct("p_type").alias("n_types"),
        F.array_join(F.array_sort(F.collect_set("p_type")), "|").alias(
            "types_sorted"
        ),
    )


@register(
    "small_part_only_brand_types",
    oracle="""
    SELECT p_brand, p_type FROM part
    EXCEPT
    SELECT p_brand, p_type FROM part WHERE p_size > 40
    """,
    survey="extension (set ops): EXCEPT (set semantics, "
    "DataFrame.subtract) — reference has only UNION (SURVEY §2.9)",
)
def small_part_only_brand_types(spark, sf_dir) -> DataFrame:
    """(brand, type) combinations that only ever ship in small sizes."""
    part = t(spark, sf_dir, "part")
    all_bt = part.select("p_brand", "p_type")
    large_bt = part.filter(F.col("p_size") > 40).select("p_brand", "p_type")
    return all_bt.subtract(large_bt)


@register(
    "nations_customers_intersect_suppliers",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    survey="extension (set ops): INTERSECT",
)
def nations_customers_intersect_suppliers(spark, sf_dir) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp)


@register(
    "salted_join_revenue",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           {scaled_sum_sql('l.l_extendedprice')} AS total_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    survey="extension (skew): salted equi-join — skewed side salted by a "
    "deterministic row hash, compact side replicated per salt; result is "
    "row-identical to the plain join (this oracle IS the plain join)",
)
def salted_join_revenue(spark, sf_dir) -> DataFrame:
    from energy_emissions_lakehouse_spark.operators.skew import salted_join

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, keys=["l_orderkey"], num_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        scaled_sum(F.col("l_extendedprice")).alias("total_price"),
    )


@register(
    "lineitem_exact_stats",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS sx,
               SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)
                   * CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS sxx,
               SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS sy,
               SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)
                   * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS sxy
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           n AS n_rows,
           ROUND(SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                 / 100.0, 6) AS stddev_qty,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * SQRT((SELECT CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            FROM (SELECT COUNT(*) AS n,
                                         SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                                             * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS syy
                                  FROM lineitem li2
                                  WHERE li2.l_returnflag = m.l_returnflag)
                           ) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
               AS corr_qty_price
    FROM m
    """,
    survey="extension (statistics): stddev + correlation derived from "
    "integer-cent moments — order-independent integer sums make the "
    "statistics bit-exact under any parallelism (plain stddev_samp/corr "
    "drift between engines by summation order)",
)
def lineitem_exact_stats(spark, sf_dir) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    xq = F.round(F.col("l_quantity") * 100, 0).cast("long")
    yp = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xq).alias("sx"),
        F.sum(xq * xq).alias("sxx"),
        F.sum(yp).alias("sy"),
        F.sum(yp * yp).alias("syy"),
        F.sum(xq * yp).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sxx = F.col("sx").cast("double"), F.col("sxx").cast("double")
    sy, syy = F.col("sy").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    var_num = n * sxx - sx * sx
    return m.select(
        "l_returnflag",
        F.col("n").alias("n_rows"),
        F.round(F.sqrt(var_num / (n * (n - F.lit(1.0)))) / F.lit(100.0), 6).alias(
            "stddev_qty"
        ),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(var_num) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("corr_qty_price"),
    )


@register(
    "window_rank_showcase",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           CAST(DENSE_RANK() OVER w AS BIGINT)   AS drank,
           ROUND(PERCENT_RANK() OVER w, 6)       AS prank,
           ROUND(CUME_DIST() OVER w, 6)          AS cdist,
           CAST(NTILE(10) OVER w AS BIGINT)      AS decile
    FROM orders
    WHERE o_orderkey % 100 = 0
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
    survey="extension (windows): dense_rank / percent_rank / cume_dist / "
    "ntile in one partitioned window pass (single sort, shared frame); "
    "percent_rank and cume_dist are exact rationals so cross-engine safe",
)
def window_rank_showcase(spark, sf_dir) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.dense_rank().over(w).cast("long").alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(10).over(w).cast("long").alias("decile"),
    )


@register(
    "string_functions_profile",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                   AS name_upper,
           CAST(length(p_name) AS BIGINT)                  AS name_len,
           replace(p_name, ' ', '_')                       AS name_snake,
           substr(p_name, 1, 5)                            AS name_prefix,
           lpad(CAST(p_partkey AS VARCHAR), 10, '0')       AS key_padded,
           concat_ws('|', p_brand, p_type)                 AS brand_type,
           CAST(strpos(p_name, 'a') AS BIGINT)             AS first_a,
           reverse(p_brand)                                AS brand_rev,
           trim('  ' || p_brand || '  ')                   AS brand_trim
    FROM part
    WHERE p_partkey % 50 = 0
    """,
    survey="extension (P3/§2.11 string surface): upper/length/replace/"
    "substr/lpad/concat_ws/instr/reverse/trim — all codegen'd JVM "
    "expressions, verified char-identical vs DuckDB",
)
def string_functions_profile(spark, sf_dir) -> DataFrame:
    part = t(spark, sf_dir, "part").filter(F.col("p_partkey") % 50 == 0)
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.instr(F.col("p_name"), "a").cast("long").alias("first_a"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias(
            "brand_trim"
        ),
    )


@register(
    "date_functions_profile",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS BIGINT)          AS y,
           CAST(QUARTER(o_orderdate) AS BIGINT)       AS q,
           CAST(MONTH(o_orderdate) AS BIGINT)         AS m,
           CAST(DAYOFWEEK(o_orderdate) + 1 AS BIGINT) AS dow,
           CAST(DAYOFYEAR(o_orderdate) AS BIGINT)     AS doy,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP)      AS plus_30d,
           date_trunc('month', o_orderdate)           AS month_start,
           strftime(o_orderdate, '%Y-%m-%d')          AS iso
    FROM orders
    WHERE o_orderkey % 100 = 0
    """,
    survey="extension (P4/P5/§2.11 date surface): year/quarter/month/"
    "dayofweek/dayofyear/last_day/date_add/date_trunc/date_format — note "
    "DuckDB dow is 0-based Sunday, Spark 1-based (oracle adds 1)",
)
def date_functions_profile(spark, sf_dir) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        # dates cast to timestamp: Spark DATE -> pandas datetime.date objects
        # while DuckDB DATE -> datetime64; timestamps normalize identically.
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.date_add(F.col("o_orderdate").cast("date"), 30)
        .cast("timestamp").alias("plus_30d"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso"),
    )


@register(
    "rolling_30d_customer_revenue",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, o_custkey,
               CAST(DATE_DIFF('day', TIMESTAMP '1970-01-01 00:00:00',
                              o_orderdate) AS BIGINT) AS order_day,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders
    )
    SELECT o_orderkey, o_custkey, order_day,
           CAST(SUM(cents) OVER (
               PARTITION BY o_custkey ORDER BY order_day
               RANGE BETWEEN 29 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 100.0 AS rolling_30d_revenue
    FROM o
    """,
    survey="extension (windows): RANGE frame — per-customer 30-day rolling "
    "revenue ordered by day number; RANGE (value-based) framing includes "
    "same-day peer rows in each frame, so the result is total-order "
    "deterministic without a tiebreaker (a ROWS frame would not be). "
    "Partitioned by customer -> scales per key; integer-cents sums keep "
    "the rolling values exact cross-engine. Completes the frame surface "
    "next to the ROWS-frame running_monthly_revenue (reference has "
    "ranking-only windows, SURVEY §2.7)",
)
def rolling_30d_customer_revenue(spark, sf_dir) -> DataFrame:
    """30-day trailing spend per customer at each order date. rangeBetween
    operates on the ORDER BY value (day number), not row position — the
    Spark analog of SQL RANGE framing."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("order_day"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("order_day")
        .rangeBetween(-29, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "order_day",
        (F.sum("cents").over(w).cast("double") / F.lit(100.0)).alias(
            "rolling_30d_revenue"
        ),
    )


@register(
    "correlated_above_nation_avg",
    oracle="""
    WITH c AS (
        SELECT c_custkey, c_nationkey,
               CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
        FROM customer
    )
    SELECT n.n_name AS nation,
           COUNT(*) AS above_avg_customers
    FROM c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.bal_cents > (SELECT AVG(c2.bal_cents)
                         FROM c c2
                         WHERE c2.c_nationkey = c.c_nationkey)
    GROUP BY n.n_name
    """,
    survey="extension (subqueries): correlated scalar subquery — Catalyst "
    "decorrelates it into an aggregate + join, so the executed plan is one "
    "shuffle per side, not a per-row re-scan (the reference has no "
    "subqueries at all, SURVEY §2). Integer-cents AVG keeps the comparison "
    "boundary exact cross-engine",
)
def correlated_above_nation_avg(spark, sf_dir) -> DataFrame:
    """Customers whose balance beats their nation's average, counted per
    nation. Expressed as a genuinely correlated scalar subquery through
    ``spark.sql`` to exercise Catalyst's decorrelation rewrite (the
    DataFrame-API equivalent would be groupBy-avg + equi-join; the
    optimized plans converge)."""
    t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal_cents"),
    ).createOrReplaceTempView("eel_corr_customer")
    t(spark, sf_dir, "nation").createOrReplaceTempView("eel_corr_nation")
    return spark.sql(
        """
        SELECT n.n_name AS nation,
               COUNT(*) AS above_avg_customers
        FROM eel_corr_customer c
        JOIN eel_corr_nation n ON n.n_nationkey = c.c_nationkey
        WHERE c.bal_cents > (SELECT AVG(c2.bal_cents)
                             FROM eel_corr_customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
        GROUP BY n.n_name
        """
    )


@register(
    "window_analytic_functions",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, o_custkey, o_orderdate,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders
    )
    SELECT o_orderkey, o_custkey,
           LAG(cents)          OVER w  AS prev_cents,
           LEAD(cents)         OVER w  AS next_cents,
           FIRST_VALUE(cents)  OVER wf AS first_cents,
           LAST_VALUE(cents)   OVER wf AS last_cents,
           NTH_VALUE(cents, 2) OVER wf AS second_cents
    FROM o
    WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    survey="extension (windows): full analytic-function surface — "
    "lag/lead/first_value/last_value/nth_value in ONE partitioned window "
    "pass (single sort per customer partition; all five functions share "
    "the shuffle). Explicit unbounded ROWS frame on the value functions: "
    "the default running frame would make last/nth order-dependent. "
    "(o_orderdate, o_orderkey) total order -> deterministic cross-engine. "
    "Completes §2.7 beyond the reference's ranking-only windows",
)
def window_analytic_functions(spark, sf_dir) -> DataFrame:
    """Per-customer order timeline: previous/next/first/last/2nd order value
    (integer cents). One window spec pair, five analytic functions, one
    exchange+sort in the physical plan."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.lag("cents").over(w).alias("prev_cents"),
        F.lead("cents").over(w).alias("next_cents"),
        F.first("cents").over(wf).alias("first_cents"),
        F.last("cents").over(wf).alias("last_cents"),
        F.nth_value("cents", 2).over(wf).alias("second_cents"),
    )


@register(
    "top100_orders_global",
    oracle="""
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    survey="extension (top-k): global ORDER BY + LIMIT — Spark plans "
    "TakeOrderedAndProject: each partition keeps a 100-row heap and only "
    "those heaps reach the driver, never a total sort. The 100 TB-safe "
    "global top-k (a full sort would range-shuffle the entire table). "
    "o_orderkey tiebreaker makes the boundary row deterministic",
)
def top100_orders_global(spark, sf_dir) -> DataFrame:
    """Top-100 orders by value. orderBy(...).limit(k) is the declarative
    form; Catalyst rewrites it to a per-partition top-k heap + single
    merge (plan-asserted in tests/test_plan_quality.py)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
        .limit(100)
    )


@register(
    "status_count_map_by_priority",
    oracle="""
    WITH c AS (
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        FROM orders GROUP BY o_orderpriority, o_orderstatus
    )
    SELECT o_orderpriority,
           STRING_AGG(o_orderstatus || ':' || CAST(n AS VARCHAR), ','
                      ORDER BY o_orderstatus) AS status_counts
    FROM c GROUP BY o_orderpriority
    """,
    survey="extension (complex types): MapType aggregation — per-group "
    "counts gathered into a map column (collect_list(struct) -> sort_array "
    "-> map_from_entries), then serialized through map_entries + transform "
    "(HOF) + array_join so the comparison is engine-neutral text. The "
    "collect_list input is pre-aggregated (<= #statuses rows per group), "
    "so the array is bounded — the 100 TB-safe way to build map columns",
)
def status_count_map_by_priority(spark, sf_dir) -> DataFrame:
    """Status->count map per order priority. Exercises Spark's map/array
    surface end-to-end: struct collect, canonical sort, map_from_entries,
    map_entries, lambda transform, array_join."""
    orders = t(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    entries = F.sort_array(F.collect_list(F.struct("o_orderstatus", "n")))
    as_map = F.map_from_entries(entries)
    serialized = F.array_join(
        F.transform(
            F.map_entries(as_map),
            lambda e: F.concat_ws(":", e.key, e.value.cast("string")),
        ),
        ",",
    )
    return counts.groupBy("o_orderpriority").agg(serialized.alias("status_counts"))


@register(
    "most_common_type_per_brand",
    oracle="""
    WITH c AS (
        SELECT p_brand, p_type, COUNT(*) AS n_parts
        FROM part GROUP BY p_brand, p_type
    ),
    r AS (
        SELECT p_brand, p_type, n_parts,
               ROW_NUMBER() OVER (PARTITION BY p_brand
                                  ORDER BY n_parts DESC, p_type) AS rn
        FROM c
    )
    SELECT p_brand, p_type AS top_type, n_parts FROM r WHERE rn = 1
    """,
    survey="extension (aggregates): argmax / deterministic MODE per group — "
    "count + ROW_NUMBER keep-first with a p_type tiebreaker (F.mode's tie "
    "choice is engine-defined, so the window form is the cross-engine-exact "
    "one). Two keyed shuffles total; the window input is pre-aggregated to "
    "|brand x type| rows, not the raw table",
)
def most_common_type_per_brand(spark, sf_dir) -> DataFrame:
    """Most frequent part type within each brand (ties -> lexically first
    type). The argmax-per-group pattern: aggregate first, then a bounded
    window over the group-level counts."""
    part = t(spark, sf_dir, "part")
    counts = part.groupBy("p_brand", "p_type").agg(
        F.count(F.lit(1)).alias("n_parts")
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("n_parts").desc(), "p_type"
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_brand", F.col("p_type").alias("top_type"), "n_parts")
    )


@register(
    "unpivot_lineitem_measures",
    oracle="""
    WITH a AS (
        SELECT l_returnflag,
               CAST(SUM(l_quantity) AS BIGINT)                              AS sum_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                    AS BIGINT)                                              AS price_cents,
               COUNT(*)                                                     AS n_rows
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
    UNION ALL
    SELECT l_returnflag, 'price_cents', price_cents FROM a
    UNION ALL
    SELECT l_returnflag, 'n_rows', n_rows FROM a
    """,
    survey="extension (reshape): UNPIVOT / melt — wide aggregate rotated to "
    "(key, measure, value) long form with DataFrame.unpivot, the inverse of "
    "pivot_revenue_by_flag. Map-side only (no shuffle beyond the source "
    "aggregate): each wide row expands to 3 long rows in place. Integer "
    "measures so the rotation is hash-exact",
)
def unpivot_lineitem_measures(spark, sf_dir) -> DataFrame:
    """Wide per-flag aggregate melted to long form. unpivot requires a
    uniform value type — all three measures are BIGINT by construction."""
    li = t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").cast("long").alias("sum_qty"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
            "price_cents"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return wide.unpivot(
        ["l_returnflag"],
        ["sum_qty", "price_cents", "n_rows"],
        "measure",
        "value",
    )


@register(
    "shipping_priority_top10",
    oracle=f"""
    SELECT l_orderkey,
           {scaled_sum_sql('l_extendedprice * (1.0 - l_discount)')} AS revenue,
           o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    survey="extension (multi-join analytics): TPC-H Q3-shaped shipping "
    "priority — 3-table join chain with per-side pushed filters, grouped "
    "revenue, global top-10 via TakeOrderedAndProject (never a total "
    "sort). Filters prune each side BEFORE its join; at 100 TB the "
    "segment filter drops ~4/5 of customers ahead of the custkey shuffle",
)
def shipping_priority_top10(spark, sf_dir) -> DataFrame:
    """Unshipped-revenue top-10 (TPC-H Q3 analog). Filter-before-join on
    all three inputs; revenue exact via the cents trick; deterministic
    tiebreak on l_orderkey."""
    cutoff = F.lit("1998-01-01").cast("timestamp")
    cust = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            scaled_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "revenue_band_forecast",
    oracle=f"""
    SELECT {scaled_sum_sql('l_extendedprice * l_discount')} AS revenue_delta,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    survey="extension (scan efficiency): TPC-H Q6-shaped forecast — pure "
    "filter+scalar-aggregate, zero joins/shuffles beyond the final "
    "single-row reduce. The whole predicate set pushes into the parquet "
    "scan (PushedFilters), so at 100 TB this reads only row groups whose "
    "min/max stats overlap the ship-date year",
)
def revenue_band_forecast(spark, sf_dir) -> DataFrame:
    """Revenue delta if mid-band discounts were dropped (TPC-H Q6 analog).
    The canonical predicate-pushdown probe: every filter reaches the scan."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        scaled_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
            "revenue_delta"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "revenue_share_within_region",
    oracle="""
    WITH n AS (
        SELECT r_name, n_name,
               SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
        FROM region
        JOIN nation   ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders   ON o_custkey = c_custkey
        GROUP BY r_name, n_name
    )
    SELECT r_name, n_name,
           CAST(cents AS DOUBLE) / 100.0 AS nation_revenue,
           ROUND(CAST(cents AS DOUBLE)
                 / CAST(SUM(cents) OVER (PARTITION BY r_name) AS DOUBLE),
                 6) AS region_share
    FROM n
    """,
    survey="extension (windows): percent-of-total — window SUM over the "
    "pre-aggregated nation rollup (|nations| rows, not the raw fact), so "
    "the window pass is negligible no matter the fact size. Dims "
    "broadcast; one keyed shuffle on the fact. Share computed on exact "
    "integer cents, one IEEE division + round at the end",
)
def revenue_share_within_region(spark, sf_dir) -> DataFrame:
    """Each nation's share of its region's order revenue. The
    aggregate-then-window pattern: the expensive groupBy reduces the fact
    first; the window only ever sees dimension-cardinality rows."""
    region = t(spark, sf_dir, "region")
    nation = t(spark, sf_dir, "nation")
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    cents = F.sum(
        F.round(F.col("o_totalprice") * 100, 0).cast("long")
    ).alias("cents")
    rolled = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(cents)
    )
    w = Window.partitionBy("r_name")
    return rolled.select(
        "r_name",
        "n_name",
        (F.col("cents").cast("double") / 100.0).alias("nation_revenue"),
        F.round(
            F.col("cents").cast("double")
            / F.sum("cents").over(w).cast("double"),
            6,
        ).alias("region_share"),
    )


@register(
    "order_price_histogram",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT)            AS bucket,
           CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) * 50000.0  AS bucket_lo,
           COUNT(*)                                                 AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                                                                    AS cents_in_bucket
    FROM orders
    GROUP BY 1, 2
    """,
    survey="extension (profiling): equi-width histogram via arithmetic "
    "binning — floor(x/width) is a pure projection, so the whole "
    "histogram is one map-side-combined hash aggregate over ~10 buckets. "
    "The distribution-profile pass that sizes skew mitigations before a "
    "100 TB job picks join strategies",
)
def order_price_histogram(spark, sf_dir) -> DataFrame:
    """Order-value histogram in fixed 50k-wide buckets. floor-binning keeps
    the bucket id integer-exact in both engines; counts and integer cents
    make the row hash exact."""
    orders = t(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000.0).cast("long")
    return (
        orders.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "cents_in_bucket"
            ),
        )
        .select(
            "bucket",
            (F.col("bucket") * 50000.0).alias("bucket_lo"),
            "n_orders",
            "cents_in_bucket",
        )
    )


@register(
    "map_transform_profile",
    oracle="""
    WITH m AS (
        SELECT p_partkey,
               p_size * 2                                        AS size2,
               CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) * 2 AS cents2
        FROM part
    )
    SELECT p_partkey,
           CASE WHEN size2 > 40 AND cents2 > 40 THEN
                    'retail_cents:' || CAST(cents2 AS VARCHAR)
                    || ',size:' || CAST(size2 AS VARCHAR)
                WHEN cents2 > 40 THEN 'retail_cents:' || CAST(cents2 AS VARCHAR)
                WHEN size2 > 40 THEN 'size:' || CAST(size2 AS VARCHAR)
                ELSE '' END AS kept
    FROM m
    """,
    survey="extension (complex types): map higher-order functions — "
    "map_from_arrays construction, transform_values (lambda over entries), "
    "map_filter, then canonical serialization via sorted map_entries. All "
    "per-row codegen expressions; the map column never shuffles. Oracle is "
    "the hand-decompiled scalar arithmetic, pinning Spark's map semantics "
    "to explicit CASE logic",
)
def map_transform_profile(spark, sf_dir) -> DataFrame:
    """Per-part metric map: build {size, retail_cents}, double every value
    (transform_values), keep entries > 40 (map_filter), serialize sorted.
    The map-column toolkit one op at a time."""
    part = t(spark, sf_dir, "part")
    m = F.map_from_arrays(
        F.array(F.lit("size"), F.lit("retail_cents")),
        F.array(
            F.col("p_size").cast("long"),
            F.round(F.col("p_retailprice") * 100, 0).cast("long"),
        ),
    )
    doubled = F.transform_values(m, lambda k, v: v * 2)
    kept = F.map_filter(doubled, lambda k, v: v > 40)
    serialized = F.array_join(
        F.transform(
            F.sort_array(F.map_entries(kept)),
            lambda e: F.concat_ws(":", e.key, e.value.cast("string")),
        ),
        ",",
    )
    return part.select("p_partkey", serialized.alias("kept"))


_QUANTILE_PS = (0.25, 0.5, 0.75, 0.99)


@register(
    "quantile_sketch_prices",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok, TRUE AS p99_ok
    FROM orders
    GROUP BY o_orderpriority
    """,
    survey="extension (sketches): approx_percentile (KLL-style quantile "
    "sketch) per order priority — mergeable per-partition sketches, one "
    "pass, fixed memory; the 100 TB path where exact percentile would "
    "shuffle every value to sort. Deterministic-verdict oracle: exact "
    "group counts hash-match DuckDB and each boolean pins the estimate's "
    "RANK (count of rows below it) within p±0.011 of the group size — "
    "rank error is what the sketch guarantees, value error is unsound "
    "near p99 (see tests/test_operators.py)",
)
def quantile_sketch_prices(spark, sf_dir) -> DataFrame:
    """Approximate o_totalprice quartiles + p99 per priority, verified by
    rank: for each estimate q we count rows < q and <= q in the group; the
    verdict passes iff [count_lt, count_le] intersects [(p-.011)n, (p+.011)n].
    accuracy=10000 bounds the sketch's true rank error at n/10000, far
    inside the verdict band. One broadcast of the 6-row estimate table back
    onto orders; no sort of the data anywhere."""
    orders = t(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    ests = orders.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", list(_QUANTILE_PS), 10000).alias("q"),
    )
    j = orders.join(F.broadcast(ests), "o_orderpriority")
    counts = [F.count(F.lit(1)).alias("n_orders")]
    for i in range(len(_QUANTILE_PS)):
        counts.append(
            F.count(F.when(F.col("o_totalprice") < F.col("q")[i], 1)).alias(f"lt{i}")
        )
        counts.append(
            F.count(F.when(F.col("o_totalprice") <= F.col("q")[i], 1)).alias(f"le{i}")
        )
    agg = j.groupBy("o_orderpriority").agg(*counts)
    out = [F.col("o_orderpriority"), F.col("n_orders")]
    for i, p in enumerate(_QUANTILE_PS):
        lo = F.col("n_orders") * F.lit(p - 0.011)
        hi = F.col("n_orders") * F.lit(p + 0.011)
        out.append(
            ((F.col(f"le{i}") >= lo) & (F.col(f"lt{i}") <= hi)).alias(
                f"p{int(p * 100)}_ok"
            )
        )
    return agg.select(*out)


@register(
    "union_missing_columns",
    oracle="""
    SELECT o_orderkey AS order_key,
           o_totalprice AS totalprice,
           CAST(NULL AS VARCHAR) AS priority
    FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, CAST(NULL AS DOUBLE), o_orderpriority
    FROM orders WHERE o_orderstatus = 'O'
    """,
    survey="extension (set ops): unionByName(allowMissingColumns=True) — "
    "schema-evolution-tolerant union, the shape of appending a new-schema "
    "day of data to an old-schema corpus. Name-based alignment (positional "
    "union would silently mis-bind), absent columns null-filled; map-side "
    "only, no shuffle",
)
def union_missing_columns(spark, sf_dir) -> DataFrame:
    """Union of two different projections of orders: finished orders carry
    totalprice, open orders carry priority; each side lacks the other's
    column and gets nulls by name."""
    orders = t(spark, sf_dir, "orders")
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_totalprice").alias("totalprice"),
    )
    open_ = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_orderpriority").alias("priority"),
    )
    return finished.unionByName(open_, allowMissingColumns=True).select(
        "order_key", "totalprice", "priority"
    )


@register(
    "large_volume_customers",
    oracle="""
    SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
           SUM(l_quantity) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    """,
    survey="extension (subqueries): TPC-H Q18-shaped IN-subquery with "
    "HAVING — the qualifying-key set is aggregated FIRST (|orders| -> "
    "handful of keys), then applied as a left-semi join before the wide "
    "3-table join runs. Filter-by-aggregate without ever materializing "
    "the subquery to the driver",
)
def large_volume_customers(spark, sf_dir) -> DataFrame:
    """Customers whose single orders exceed 300 total units (TPC-H Q18
    analog). The IN (SELECT ... HAVING) becomes aggregate -> semi join;
    l_quantity sums are integer-valued doubles, exact under parallelism."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )


@register(
    "promo_revenue_share",
    oracle="""
    WITH j AS (
        SELECT p_type,
               CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100, 0)
                    AS BIGINT) AS cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
    )
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN cents
                                       ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(cents) AS DOUBLE), 6)          AS promo_share_pct,
           CAST(SUM(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)
                AS BIGINT)                                 AS promo_cents,
           CAST(SUM(cents) AS BIGINT)                      AS total_cents
    FROM j
    """,
    survey="extension (conditional aggregation): TPC-H Q14-shaped promo "
    "revenue ratio — CASE-gated and total sums computed in ONE aggregate "
    "pass over the join (never two scans), ship-date filter pushed into "
    "the lineitem scan. Integer-cent sums make the single final division "
    "cross-engine exact",
)
def promo_revenue_share(spark, sf_dir) -> DataFrame:
    """Share of 1997 revenue from PROMO-type parts (TPC-H Q14 analog):
    two conditional sums in one pass, one division at the end."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    cents = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100, 0
    ).cast("long")
    j = li.join(part, li.l_partkey == part.p_partkey).select(
        "p_type", cents.alias("cents")
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", F.col("cents")).otherwise(F.lit(0))
    )
    total = F.sum("cents")
    return j.agg(
        F.round(
            100.0 * promo.cast("double") / total.cast("double"), 6
        ).alias("promo_share_pct"),
        promo.alias("promo_cents"),
        total.alias("total_cents"),
    )


@register(
    "local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {scaled_sum_sql('l_extendedprice * (1.0 - l_discount)')} AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    survey="extension (multi-join analytics): TPC-H Q5-shaped 6-table "
    "star-plus-constraint join — region/nation/supplier broadcast, "
    "customer->orders->lineitem shuffle chain, plus the non-star "
    "local-supplier predicate (s_nationkey = c_nationkey) applied as a "
    "join condition, not a post-filter. Region + date filters prune "
    "before any shuffle",
)
def local_supplier_volume(spark, sf_dir) -> DataFrame:
    """Revenue from intra-nation supply chains in ASIA, 1997 (TPC-H Q5
    analog). The biggest join tree in the suite — six tables, two shuffle
    joins, three broadcasts."""
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = t(spark, sf_dir, "nation")
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(orders, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supp),
            (supp.s_suppkey == li.l_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .groupBy("n_name")
        .agg(
            scaled_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("revenue")
        )
    )


_PARTS_NEVER_ORDERED_SQL = """
    SELECT p_partkey, p_name, p_brand
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_partkey = p.p_partkey
          AND l.l_shipdate >= TIMESTAMP '2001-01-01'
    )
"""


@register(
    "parts_never_ordered",
    oracle=_PARTS_NEVER_ORDERED_SQL,
    survey="extension (subqueries): NOT EXISTS anti-semantics via "
    "spark.sql — IDENTICAL SQL text runs on both engines; Catalyst "
    "rewrites the correlated NOT EXISTS to a left-anti join (no per-row "
    "re-scan). The null-safe way to write NOT IN (which silently returns "
    "empty if the subquery ever yields a null key)",
)
def parts_never_ordered(spark, sf_dir) -> DataFrame:
    """Parts with no shipment since 2001 — stale-inventory detection. One
    SQL string, two engines; Spark pushes the date filter into the
    lineitem scan and plans a left-anti join on p_partkey."""
    t(spark, sf_dir, "part").createOrReplaceTempView("part")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_PARTS_NEVER_ORDERED_SQL)


_ACTIVE_CUSTOMERS_SQL = """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2001-01-01'
    )
"""


@register(
    "active_customers_exists",
    oracle=_ACTIVE_CUSTOMERS_SQL,
    survey="extension (subqueries): correlated EXISTS via spark.sql — "
    "same SQL text on both engines; Catalyst decorrelates to a left-semi "
    "join with the date filter pushed into the orders scan (plan-asserted "
    "in tests/test_plan_quality.py)",
)
def active_customers_exists(spark, sf_dir) -> DataFrame:
    """Customers with at least one 2001 order, written as the EXISTS a
    SQL-first user would write. Semi-join semantics: each customer emits
    at most once regardless of order count."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_ACTIVE_CUSTOMERS_SQL)


@register(
    "dq_expectations_orders",
    oracle="""
    SELECT 'null_custkey' AS rule,
           CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
               AS n_violations
    FROM orders
    UNION ALL
    SELECT 'price_out_of_range',
           CAST(COUNT(*) FILTER (WHERE o_totalprice IS NULL
                 OR o_totalprice < 0 OR o_totalprice > 1000000) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'bad_status',
           CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P'))
                AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'duplicate_orderkey',
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
    FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders
          GROUP BY o_orderkey HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'orphan_custkey',
           CAST(COUNT(*) AS BIGINT)
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey)
    """,
    survey="extension (data quality): declarative expectation suite — the "
    "reference's fail-fast null audit (Q1, load_to_postgres.py:182-187) "
    "generalized to rules-as-data: all row-level rules evaluate in ONE "
    "scan (conditional sums), key uniqueness is one keyed aggregate, "
    "referential integrity is one anti join. Emits (rule, n_violations) "
    "— the gate a 100 TB ingest runs before promoting a layer",
)
def dq_expectations_orders(spark, sf_dir) -> DataFrame:
    """Five data-quality expectations over orders: null key, price range,
    status domain, key uniqueness, referential integrity to customer.
    Row-level rules share a single pass; only the set-level rules add
    their own (keyed) stages."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")

    def viol(name: str, cond) -> DataFrame:
        return orders.agg(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias("n")
        ).select(F.lit(name).alias("rule"), F.col("n").alias("n_violations"))

    row_rules = viol("null_custkey", F.col("o_custkey").isNull()).unionByName(
        viol(
            "price_out_of_range",
            F.col("o_totalprice").isNull()
            | (F.col("o_totalprice") < 0)
            | (F.col("o_totalprice") > 1_000_000),
        )
    ).unionByName(
        viol("bad_status", ~F.col("o_orderstatus").isin("F", "O", "P"))
    )
    dups = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).cast("long").alias("n"))
        .select(
            F.lit("duplicate_orderkey").alias("rule"),
            F.col("n").alias("n_violations"),
        )
    )
    orphans = (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.lit("orphan_custkey").alias("rule"),
            F.col("n").alias("n_violations"),
        )
    )
    return row_rules.unionByName(dups).unionByName(orphans)


@register(
    "null_safe_join_priority",
    oracle="""
    WITH a AS (
        SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS prio,
               COUNT(*) AS n_f
        FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
    ),
    b AS (
        SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS prio,
               COUNT(*) AS n_o
        FROM orders WHERE o_orderstatus = 'O' GROUP BY 1
    )
    SELECT a.prio, a.n_f, b.n_o
    FROM a JOIN b ON a.prio IS NOT DISTINCT FROM b.prio
    """,
    survey="extension (joins): null-safe equality join (<=> / IS NOT "
    "DISTINCT FROM) — null keys MATCH each other instead of vanishing, "
    "the semantic needed when a grouping key legitimately contains null "
    "(e.g. 'unknown' buckets). Still hash-partitionable: null hashes to "
    "a single bucket, so it shuffles like any equi-join",
)
def null_safe_join_priority(spark, sf_dir) -> DataFrame:
    """Join two per-priority rollups where one priority is nulled out:
    plain == would drop the null bucket, eqNullSafe keeps it."""
    orders = t(spark, sf_dir, "orders")
    prio = F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("prio")
    a = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy(prio)
        .agg(F.count(F.lit(1)).alias("n_f"))
    )
    b = (
        orders.filter(F.col("o_orderstatus") == "O")
        .groupBy(prio)
        .agg(F.count(F.lit(1)).alias("n_o"))
    )
    return a.join(b, a.prio.eqNullSafe(b.prio)).select(
        a.prio.alias("prio"), "n_f", "n_o"
    )


@register(
    "global_row_ids_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) AS BIGINT) AS row_id
    FROM orders
    """,
    survey="extension (numbering, scale path): dense global row ids "
    "WITHOUT a single-partition window — range-repartition by key, rank "
    "locally per partition (window keyed by spark_partition_id), then add "
    "broadcast per-partition offsets (a ~#partitions-row cumulative sum). "
    "The oracle is the naive global ROW_NUMBER; the two results must be "
    "identical, proving the two-phase form is a drop-in replacement that "
    "never funnels the data through one task",
)
def global_row_ids_orders(spark, sf_dir) -> DataFrame:
    """zipWithIndex for DataFrames: consecutive 1-based ids in o_orderkey
    order via local ranks + cumulative partition offsets. Driver traffic
    is one row per partition (counts), never data."""
    orders = t(spark, sf_dir, "orders").select("o_orderkey")
    parts = orders.repartitionByRange(8, "o_orderkey").withColumn(
        "pid", F.spark_partition_id()
    )
    local_w = Window.partitionBy("pid").orderBy("o_orderkey")
    ranked = parts.withColumn("local_rank", F.row_number().over(local_w))
    # offsets: cumulative count of all earlier partitions (tiny frame)
    counts = ranked.groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
    offsets = counts.withColumn(
        "offset",
        F.coalesce(
            F.sum("n").over(
                Window.orderBy("pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("pid", "offset")
    return (
        ranked.join(F.broadcast(offsets), "pid")
        .select(
            "o_orderkey",
            (F.col("offset") + F.col("local_rank")).cast("long").alias("row_id"),
        )
    )


@register(
    "disjunctive_predicate_revenue",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           {scaled_sum_sql('l_extendedprice * (1.0 - l_discount)')} AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_type = 'SMALL'  AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1  AND l_quantity <= 15)
       OR (p_type = 'MEDIUM' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 25)
       OR (p_type = 'LARGE'  AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 35)
    """,
    survey="extension (scan efficiency): TPC-H Q19-shaped disjunction of "
    "conjunctions — Catalyst extracts the common sub-predicates each side "
    "can evaluate alone (quantity bounds -> lineitem scan, type/size -> "
    "part scan) BEFORE the join, so the OR-of-ANDs only fully evaluates "
    "on join survivors. The predicate shape that defeats naive pushdown",
)
def disjunctive_predicate_revenue(spark, sf_dir) -> DataFrame:
    """Revenue under a 3-branch OR-of-ANDs spanning both join sides
    (TPC-H Q19 analog). Written as the single post-join predicate a user
    would write — pushdown is Catalyst's job, verified in the plan audit."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    j = li.join(part, part.p_partkey == li.l_partkey)
    q, p_t, p_s = F.col("l_quantity"), F.col("p_type"), F.col("p_size")
    cond = (
        ((p_t == "SMALL") & p_s.between(1, 15) & (q >= 1) & (q <= 15))
        | ((p_t == "MEDIUM") & p_s.between(10, 30) & (q >= 10) & (q <= 25))
        | ((p_t == "LARGE") & p_s.between(20, 50) & (q >= 20) & (q <= 35))
    )
    return j.filter(cond).agg(
        F.count(F.lit(1)).alias("n_rows"),
        scaled_sum(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        ).alias("revenue"),
    )


@register(
    "latest_order_per_customer",
    oracle="""
    WITH r AS (
        SELECT o_custkey, o_orderkey, o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC)
                   AS rn
        FROM orders
    )
    SELECT o_custkey,
           o_orderdate AS latest_orderdate,
           o_orderkey  AS latest_orderkey
    FROM r WHERE rn = 1
    """,
    survey="extension (aggregates): one-pass argmax via max(struct(...)) "
    "— a single hash aggregate replaces the window ROW_NUMBER keep-first "
    "pattern (no sort, half the shuffle payload: only the running max "
    "survives per group map-side). Struct comparison is lexicographic, "
    "so (o_orderdate, o_orderkey) makes ties deterministic; the oracle "
    "IS the window form, proving the rewrite is exact",
)
def latest_order_per_customer(spark, sf_dir) -> DataFrame:
    """Each customer's most recent order in ONE aggregation pass:
    max(struct(date, key)) instead of a partitioned window sort. The
    group-by form partial-aggregates map-side — at 100 TB that's the
    difference between shuffling every row and shuffling one row per
    (partition, customer)."""
    orders = t(spark, sf_dir, "orders")
    top = F.max(F.struct("o_orderdate", "o_orderkey")).alias("m")
    return (
        orders.groupBy("o_custkey")
        .agg(top)
        .select(
            "o_custkey",
            F.col("m.o_orderdate").alias("latest_orderdate"),
            F.col("m.o_orderkey").alias("latest_orderkey"),
        )
    )


@register(
    "try_arithmetic_profile",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN TRY_CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT)
                         IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_numeric_prefix,
           CAST(SUM(CASE WHEN o_totalprice = 0 THEN NULL
                         ELSE CAST(ROUND(o_totalprice, 0) AS BIGINT) END)
                AS BIGINT) AS sum_rounded,
           COUNT(*) AS n_rows
    FROM orders
    GROUP BY o_orderpriority
    """,
    survey="extension (P2 coercion surface): try_* error-safe arithmetic "
    "— try_cast for lenient string->number (the ANSI-mode-safe spelling "
    "of the reference's errors='coerce', SURVEY §2.2 P2) and nullif-"
    "guarded division semantics, all evaluated per-row in codegen. These "
    "are the expressions that keep a 100 TB job from dying on one bad "
    "row when ANSI mode is ON",
)
def try_arithmetic_profile(spark, sf_dir) -> DataFrame:
    """Error-safe coercion probe: try_cast the priority's numeric prefix
    (always succeeds for '1-URGENT'..'5-LOW'), null-guarded rounding sum.
    Works identically with ANSI on or off — the forward-compatible way to
    write the reference's coerce-to-null cleaning."""
    orders = t(spark, sf_dir, "orders")
    prefix_ok = (
        F.substring("o_orderpriority", 1, 1).try_cast("bigint").isNotNull()
    )
    return orders.groupBy("o_orderpriority").agg(
        F.sum(F.when(prefix_ok, 1).otherwise(0))
        .cast("long")
        .alias("n_numeric_prefix"),
        F.sum(
            F.when(F.col("o_totalprice") == 0, F.lit(None)).otherwise(
                F.round("o_totalprice", 0).cast("long")
            )
        )
        .cast("long")
        .alias("sum_rounded"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_CHEAPEST_SUPPLIER_SQL = """
    SELECT l.l_partkey, l.l_suppkey,
           MIN(CAST(ROUND(l.l_extendedprice / l.l_quantity * 100, 0)
                    AS BIGINT)) AS unit_price_cents
    FROM lineitem l
    WHERE CAST(ROUND(l.l_extendedprice / l.l_quantity * 100, 0) AS BIGINT) = (
        SELECT MIN(CAST(ROUND(i.l_extendedprice / i.l_quantity * 100, 0)
                        AS BIGINT))
        FROM lineitem i
        WHERE i.l_partkey = l.l_partkey
    )
    GROUP BY l.l_partkey, l.l_suppkey
"""


@register(
    "cheapest_supplier_per_part",
    oracle=_CHEAPEST_SUPPLIER_SQL,
    survey="extension (subqueries): TPC-H Q2-shaped correlated scalar MIN "
    "subquery in WHERE — the same SQL text runs on both engines; Catalyst "
    "decorrelates the per-part MIN into one aggregate + join over the "
    "grouped keys (never a per-row re-scan). The keep-all-argmin variant "
    "of argmax-per-group: ties all survive, unlike ROW_NUMBER keep-first",
)
def cheapest_supplier_per_part(spark, sf_dir) -> DataFrame:
    """Suppliers matching the minimum unit price within each part (TPC-H
    Q2's correlated-min shape on the tables we have). Integer-cent unit
    prices make the correlated equality exact and portable."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_CHEAPEST_SUPPLIER_SQL)


_IDLE_RICH_CUSTOMERS_SQL = """
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
               AS balance_cents
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT CAST(SUM(CAST(ROUND(i.c_acctbal * 100, 0) AS BIGINT))
                    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0
        FROM customer i WHERE i.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY c_mktsegment
"""


@register(
    "idle_rich_customers",
    oracle=_IDLE_RICH_CUSTOMERS_SQL,
    survey="extension (subqueries): TPC-H Q22-shaped uncorrelated scalar "
    "subquery (global AVG threshold, computed once and broadcast as a "
    "literal-like filter) + correlated NOT EXISTS anti join, composed in "
    "one statement; same SQL text on both engines. Aggregated output "
    "keeps the row hash scale-stable",
)
def idle_rich_customers(spark, sf_dir) -> DataFrame:
    """Above-average-balance customers with no order since 2001, per
    segment — the churned-high-value cohort. One scalar subquery pass +
    one date-filtered anti join."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_IDLE_RICH_CUSTOMERS_SQL)


_TOP_REVENUE_SUPPLIER_SQL = """
    WITH rev AS (
        SELECT l_suppkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount)
                                   * 100, 0) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, revenue_cents
    FROM supplier
    JOIN rev ON s_suppkey = l_suppkey
    WHERE revenue_cents = (SELECT MAX(revenue_cents) FROM rev)
"""


@register(
    "top_revenue_supplier",
    oracle=_TOP_REVENUE_SUPPLIER_SQL,
    survey="extension (subqueries): TPC-H Q15-shaped CTE + scalar MAX "
    "against the same CTE — the rollup is computed once, referenced "
    "twice (Catalyst may inline or reuse-exchange it; either plan reads "
    "the fact once per reference, never per-row). Ties all survive, the "
    "semantic LIMIT 1 would break. Same SQL text on both engines",
)
def top_revenue_supplier(spark, sf_dir) -> DataFrame:
    """The quarter's top supplier(s) by revenue (TPC-H Q15 analog):
    grouped CTE + uncorrelated scalar MAX over it. Integer cents keep
    the equality exact under any aggregation order."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(_TOP_REVENUE_SUPPLIER_SQL)


_SOLE_SUPPLIER_ORDERS_SQL = """
    SELECT s.s_suppkey, s.s_name,
           CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS n_sole_orders
    FROM supplier s
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l.l_orderkey
                        AND l2.l_suppkey != l.l_suppkey)
    GROUP BY s.s_suppkey, s.s_name
"""


@register(
    "sole_supplier_orders",
    oracle=_SOLE_SUPPLIER_ORDERS_SQL,
    survey="extension (subqueries): TPC-H Q21-shaped correlated NOT "
    "EXISTS against the SAME fact table being scanned (self-anti-join on "
    "order membership) + distinct aggregate — orders supplied "
    "exclusively by one supplier. Spark rejects the join-condition "
    "variant (correlated subquery over both join inputs); the WHERE-"
    "clause form decorrelates to an anti join. Same SQL text on both "
    "engines",
)
def sole_supplier_orders(spark, sf_dir) -> DataFrame:
    """Per supplier: orders they supplied alone (no other supplier on
    any line) — the single-source-dependency exposure report. The NOT
    EXISTS correlates only to the scanned lineitem side, the form
    Catalyst can decorrelate."""
    t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_SOLE_SUPPLIER_ORDERS_SQL)


@register(
    "moving_avg_weekly_revenue",
    oracle="""
    WITH daily AS (
        SELECT DATE_TRUNC('day', o_orderdate) AS d,
               SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
        FROM orders GROUP BY 1
    )
    SELECT d,
           CAST(cents AS BIGINT) AS day_cents,
           CAST(SUM(cents) OVER w AS BIGINT)   AS win_cents,
           CAST(COUNT(*) OVER w AS BIGINT)     AS win_days,
           ROUND(CAST(SUM(cents) OVER w AS DOUBLE)
                 / CAST(COUNT(*) OVER w AS DOUBLE) / 100.0, 6)
               AS moving_avg
    FROM daily
    WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    survey="extension (windows): bounded ROWS frame (6 PRECEDING) moving "
    "average — the physical-row sliding frame, complementing the RANGE "
    "(value-based) 30-day frame and the unbounded running sum. Computed "
    "over the pre-aggregated DAILY rollup (<=2,500 rows for 7 years), so "
    "the unpartitioned ordered window is bounded by the calendar, never "
    "the fact size; integer cents keep sum and count exact, one division "
    "at the end",
)
def moving_avg_weekly_revenue(spark, sf_dir) -> DataFrame:
    """7-day (7-row) trailing average of daily order revenue. Aggregate to
    calendar grain FIRST; the window only ever sees calendar-bounded rows."""
    orders = t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "cents"
        )
    )
    w = Window.orderBy("d").rowsBetween(-6, Window.currentRow)
    return daily.select(
        "d",
        F.col("cents").alias("day_cents"),
        F.sum("cents").over(w).alias("win_cents"),
        F.count(F.lit(1)).over(w).alias("win_days"),
        F.round(
            F.sum("cents").over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double")
            / 100.0,
            6,
        ).alias("moving_avg"),
    )


_ANALYZE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


@register(
    "analyze_table_stats",
    oracle=" UNION ALL ".join(
        f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
            CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
            COUNT(DISTINCT {c}) AS n_distinct,
            TRUE AS approx_within_6pct
        FROM orders"""
        for c in _ANALYZE_COLS
    ),
    survey="extension (warehouse ops): ANALYZE-style column statistics — "
    "per-column row/null/distinct counts over orders (the stats pass "
    "that feeds a cost-based optimizer / data catalog), exact family and "
    "sketch family in separate single-row aggregates (mixing them makes "
    "Catalyst replicate HLL updates across every distinct-Expand "
    "projection — measured 4x slower fused). Each column carries an "
    "approx_count_distinct sketch pinned within 3*rsd of the exact "
    "count by a verdict boolean — at 100 TB the sketch IS the distinct "
    "estimate (mergeable KB state, no key shuffle) and the exact column "
    "here certifies it. Long (column-per-row) output so schema growth "
    "never changes the result shape",
)
def analyze_table_stats(spark, sf_dir) -> DataFrame:
    """Two single-row aggregation passes (exact family, sketch family)
    cross-joined, then unpivoted to one row per column via an exploded
    struct array.

    Why two passes: mixing DISTINCT aggregates with non-distinct HLL
    sketches in ONE agg makes Catalyst replicate the sketch updates
    across every Expand projection (one per distinct column) — measured
    7.8 s vs 0.6 s + 1.7 s for the split form at sf0.01. Two scans of a
    columnar table are cheaper than one exploded scan."""
    orders = t(spark, sf_dir, "orders")
    exact_aggs = [F.count(F.lit(1)).alias("n_rows")]
    approx_aggs = []
    for c in _ANALYZE_COLS:
        exact_aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"nn_{c}")
        )
        exact_aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
        approx_aggs.append(F.approx_count_distinct(c, rsd=0.02).alias(f"ad_{c}"))
    one = orders.agg(*exact_aggs).crossJoin(
        F.broadcast(orders.agg(*approx_aggs))
    )
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"nn_{c}").alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
                (
                    F.abs(F.col(f"ad_{c}") - F.col(f"nd_{c}"))
                    <= F.greatest(
                        F.lit(1.0), F.col(f"nd_{c}") * F.lit(0.06)
                    )
                ).alias("approx_within_6pct"),
            )
            for c in _ANALYZE_COLS
        ]
    )
    return one.select("n_rows", F.explode(per_col).alias("s")).select(
        F.col("s.col_name").alias("col_name"),
        "n_rows",
        F.col("s.n_nulls").alias("n_nulls"),
        F.col("s.n_distinct").alias("n_distinct"),
        F.col("s.approx_within_6pct").alias("approx_within_6pct"),
    )


@register(
    "merge_changefeed_orders",
    oracle=f"""
    WITH src AS (
        SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
               o_totalprice * 1.1 AS o_totalprice, o_orderdate,
               o_orderpriority
        FROM orders WHERE (o_orderkey % 10) = 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_custkey, 'I' AS o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM orders WHERE (o_orderkey % 20) = 0
    ),
    pre AS (
        SELECT o.o_orderstatus, o.o_totalprice,
               'update_preimage' AS _change_type
        FROM orders o WHERE EXISTS (
            SELECT 1 FROM src s WHERE s.o_orderkey = o.o_orderkey)
    ),
    post AS (
        SELECT s.o_orderstatus, s.o_totalprice,
               'update_postimage' AS _change_type
        FROM src s WHERE EXISTS (
            SELECT 1 FROM orders o WHERE o.o_orderkey = s.o_orderkey)
    ),
    ins AS (
        SELECT s.o_orderstatus, s.o_totalprice, 'insert' AS _change_type
        FROM src s WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_orderkey = s.o_orderkey)
    ),
    feed AS (SELECT * FROM pre UNION ALL SELECT * FROM post
             UNION ALL SELECT * FROM ins)
    SELECT _change_type, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {{scaled}} AS total_price
    FROM feed GROUP BY _change_type, o_orderstatus
    ORDER BY _change_type, o_orderstatus
    """.format(scaled=scaled_sum_sql("o_totalprice")),
    survey="extension (lakehouse, change data capture): the CHANGE DATA "
    "FEED of a MERGE — Delta CDF (`table_changes`) semantics emulated "
    "relationally: touched rows emit update_preimage/update_postimage "
    "pairs, new keys emit insert rows, tagged in _change_type. The "
    "output incremental consumers (sync, aggregate maintenance, audit) "
    "read instead of diffing table snapshots; feed volume is O(|source|) "
    "never O(|target|), built from three equi-joins sharing one shuffle "
    "key. On Delta this entire operator is `table_changes(t, v1, v2)`",
)
def merge_changefeed_orders(spark, sf_dir) -> DataFrame:
    """Change feed of an orders upsert (10% updated, 5% new keys),
    profiled by change type and status."""
    from energy_emissions_lakehouse_spark.operators.merge import (
        upsert_change_feed,
    )

    orders = t(spark, sf_dir, "orders")
    updates = orders.filter((F.col("o_orderkey") % 10) == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * F.lit(1.1)).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    inserts = orders.filter((F.col("o_orderkey") % 20) == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        F.lit("I").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    feed = upsert_change_feed(
        target=orders,
        source=updates.unionByName(inserts),
        keys=["o_orderkey"],
    )
    return (
        feed.groupBy("_change_type", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            scaled_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("_change_type", "o_orderstatus")
    )


@register(
    "merge_full_sync_customer_dim",
    oracle="""
    WITH snap AS (
        SELECT c_custkey, c_name, c_nationkey,
               CASE WHEN c_custkey % 7 = 0 THEN 'MACHINERY2'
                    ELSE c_mktsegment END AS c_mktsegment,
               c_acctbal
        FROM customer WHERE c_custkey % 10 <> 0
    ),
    pre AS (
        SELECT c.c_mktsegment, 'update_preimage' AS _change_type
        FROM customer c WHERE EXISTS (
            SELECT 1 FROM snap s WHERE s.c_custkey = c.c_custkey)
    ),
    post AS (
        SELECT s.c_mktsegment, 'update_postimage' AS _change_type
        FROM snap s WHERE EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = s.c_custkey)
    ),
    ins AS (
        SELECT s.c_mktsegment, 'insert' AS _change_type
        FROM snap s WHERE NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = s.c_custkey)
    ),
    dels AS (
        SELECT c.c_mktsegment, 'delete' AS _change_type
        FROM customer c WHERE NOT EXISTS (
            SELECT 1 FROM snap s WHERE s.c_custkey = c.c_custkey)
    ),
    feed AS (SELECT * FROM pre UNION ALL SELECT * FROM post
             UNION ALL SELECT * FROM ins UNION ALL SELECT * FROM dels)
    SELECT _change_type, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM feed GROUP BY _change_type, c_mktsegment
    ORDER BY _change_type, c_mktsegment
    """,
    survey="extension (lakehouse CDC, full-sync MERGE): the WHEN NOT "
    "MATCHED BY SOURCE THEN DELETE clause — a dimension SNAPSHOT reload "
    "(10% of customers gone, some segments relabeled) merges against the "
    "current dim and the change feed additionally emits delete rows for "
    "keys absent from the snapshot. The full-snapshot-sync shape every "
    "dim reload needs; delete detection is one more anti join on the "
    "same shuffle key",
)
def merge_full_sync_customer_dim(spark, sf_dir) -> DataFrame:
    """Full-sync dimension reload change feed: a customer snapshot
    missing 10% of keys (and relabeling some segments) merges with
    delete_unmatched=True; feed profiled by change type and segment."""
    from energy_emissions_lakehouse_spark.operators.merge import (
        upsert_change_feed,
    )

    cust = t(spark, sf_dir, "customer")
    snap = cust.filter(F.col("c_custkey") % 10 != 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.when(F.col("c_custkey") % 7 == 0, "MACHINERY2")
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        "c_acctbal",
    )
    feed = upsert_change_feed(
        target=cust.select(
            "c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"
        ),
        source=snap,
        keys=["c_custkey"],
        delete_unmatched=True,
    )
    return (
        feed.groupBy("_change_type", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("_change_type", "c_mktsegment")
    )


#: Keyset-pagination geometry: page size and the last key of "page 2"
#: (deterministic: derived from the sorted order at any SF by taking the
#: boundary via a subquery, so the query text is self-contained).
PAGE_SIZE = 25


@register(
    "keyset_pagination_orders",
    oracle=f"""
    WITH boundary AS (
      SELECT o_orderdate AS b_date, o_orderkey AS b_key
      FROM orders
      ORDER BY o_orderdate, o_orderkey
      LIMIT 1 OFFSET {2 * PAGE_SIZE - 1}
    )
    SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
           ROUND(CAST(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)
                      AS DOUBLE) / 100.0, 2) AS total_price
    FROM orders o CROSS JOIN boundary
    WHERE (o.o_orderdate, o.o_orderkey) > (b_date, b_key)
    ORDER BY o.o_orderdate, o.o_orderkey
    LIMIT {PAGE_SIZE}
    """,
    survey="extension (serving): keyset (seek) pagination — page 3 of the "
    "date-ordered orders fetched by a composite-key range predicate + "
    "top-K, NOT by OFFSET: the predicate pushes into the scan and the "
    "LIMIT runs as per-partition heaps (TakeOrderedAndProject), so page "
    "N costs the same as page 1. OFFSET pagination at 100 TB scans and "
    "sorts everything before the page — the classic API-serving trap. "
    "The boundary row is resolved in-plan so the query is "
    "self-contained; a real API passes it as the page token",
)
def keyset_pagination_orders(spark, sf_dir) -> DataFrame:
    """Page 3 (rows 51-75) of orders ordered by (date, key), fetched via
    the keyset predicate (date, key) > (boundary) instead of OFFSET 50."""
    orders = t(spark, sf_dir, "orders")
    boundary = (
        orders.orderBy("o_orderdate", "o_orderkey")
        .limit(2 * PAGE_SIZE)
        .orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
        .limit(1)
        .select(
            F.col("o_orderdate").alias("b_date"),
            F.col("o_orderkey").alias("b_key"),
        )
    )
    page = (
        orders.crossJoin(F.broadcast(boundary))
        .filter(
            (F.col("o_orderdate") > F.col("b_date"))
            | (
                (F.col("o_orderdate") == F.col("b_date"))
                & (F.col("o_orderkey") > F.col("b_key"))
            )
        )
        .orderBy("o_orderdate", "o_orderkey")
        .limit(PAGE_SIZE)
    )
    return page.select(
        "o_orderkey",
        "o_orderdate",
        "o_orderpriority",
        F.round(
            F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("double")
            / F.lit(100.0),
            2,
        ).alias("total_price"),
    )
