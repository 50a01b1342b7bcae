"""Remaining TPC-H query shapes (Q4/Q7/Q8/Q9/Q10/Q11/Q12/Q13/Q16/Q17/Q20
analogs) — with queries/core.py this completes all 22 TPC-H shapes.

Completes the OLAP shape coverage started in queries/core.py (which spans
Q1/Q2/Q3/Q5/Q6/Q14/Q15/Q18/Q19/Q21/Q22 analogs). The testdata schema has
no partsupp table and no l_shipmode/l_commitdate columns, so Q9/Q12/Q20
substitute equivalent predicates over the columns that exist — the SHAPE
(join graph, correlation pattern, aggregation structure) is what each
query exercises, per SURVEY.md §2.5-2.6.

Money sums use the scaled-integer helpers (functions/exact.py) so Spark's
parallel partial aggregation and DuckDB's sequential sum agree exactly;
every ORDER BY carries a unique tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from energy_emissions_lakehouse_spark.functions.exact import (
    scaled_sum,
    scaled_sum_sql,
)
from energy_emissions_lakehouse_spark.registry import register
from energy_emissions_lakehouse_spark.tables import t

_REV = "l_extendedprice * (1.0 - l_discount)"


@register(
    "late_shipment_priority_counts",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    survey="extension (semi-join aggregate): TPC-H Q4-shaped order "
    "priority check — EXISTS with a non-equi correlated predicate "
    "(shipped >30 days after order) planned as a left-semi hash join on "
    "the order key with the range condition as join residual; no "
    "subquery re-scan per row",
)
def late_shipment_priority_counts(spark, sf_dir) -> DataFrame:
    """Orders placed in 1997 with at least one lineitem shipped more than
    30 days later, counted per priority (TPC-H Q4 analog)."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "nation_pair_trade_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
           {scaled_sum_sql(_REV)} AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    survey="extension (multi-join analytics): TPC-H Q7-shaped bilateral "
    "trade volume — same fact row joins the nation dim TWICE (supplier "
    "side and customer side, disambiguated aliases); the disjunctive "
    "nation-pair predicate survives only as a post-join filter while the "
    "shipdate range is pushed to the scan; both nation dims broadcast",
)
def nation_pair_trade_volume(spark, sf_dir) -> DataFrame:
    """Revenue shipped between two specific nations, per direction and
    year (TPC-H Q7 analog)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(scaled_sum(rev).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "regional_market_share",
    oracle=f"""
    WITH j AS (
        SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
               sn.n_name AS supp_nation,
               CAST(ROUND(({_REV}) * 100, 0) AS BIGINT) AS cents
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = cn.n_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        WHERE r_name = 'ASIA'
    )
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN cents
                               ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(cents) AS DOUBLE), 6) AS mkt_share,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN cents ELSE 0 END)
                AS BIGINT) AS nation_cents,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM j GROUP BY o_year ORDER BY o_year
    """,
    survey="extension (conditional share): TPC-H Q8-shaped market share — "
    "7-table star with the nation dim joined twice, numerator gated by a "
    "CASE inside the same single aggregate pass as the denominator; "
    "integer-cent sums make the one final division cross-engine exact",
)
def regional_market_share(spark, sf_dir) -> DataFrame:
    """NATION_5 suppliers' share of revenue delivered to ASIA customers,
    per order year (TPC-H Q8 analog)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cents = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100, 0
    ).cast("long")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("cn_region") == F.col("r_regionkey"),
        )
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            "supp_nation",
            cents.alias("cents"),
        )
    )
    nation_cents = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", F.col("cents")).otherwise(
            F.lit(0)
        )
    )
    total = F.sum("cents")
    return (
        j.groupBy("o_year")
        .agg(
            F.round(
                nation_cents.cast("double") / total.cast("double"), 6
            ).alias("mkt_share"),
            nation_cents.alias("nation_cents"),
            total.alias("total_cents"),
        )
        .orderBy("o_year")
    )


@register(
    "profit_by_supp_nation_year",
    oracle=f"""
    SELECT sn.n_name AS nation,
           CAST(YEAR(l_shipdate) AS BIGINT) AS o_year,
           {scaled_sum_sql(f"{_REV} - 0.1 * p_retailprice * l_quantity")}
               AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    survey="extension (profit rollup): TPC-H Q9-shaped product profit by "
    "supplier nation and year — no partsupp table in this schema, so unit "
    "cost is proxied as 10% of p_retailprice (shape preserved: revenue "
    "minus cost aggregated over a part-name LIKE filter and a twice-"
    "removed dim); LIKE filter pushed to the part scan, dims broadcast",
)
def profit_by_supp_nation_year(spark, sf_dir) -> DataFrame:
    """Profit (revenue minus proxied supply cost) on widget parts by
    supplier nation and ship year (TPC-H Q9 analog)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    amount = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    )
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
    )
    return (
        j.groupBy(
            "nation", F.year("l_shipdate").cast("long").alias("o_year")
        )
        .agg(scaled_sum(amount).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "top_returned_revenue_customers",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {scaled_sum_sql(_REV)} AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    survey="extension (top-k aggregate): TPC-H Q10-shaped returned-item "
    "loss ranking — grouped revenue over a 4-table join, then global "
    "top-20 (TakeOrderedAndProject, no full sort); revenue is an exact "
    "scaled-integer sum so the DESC ordering is total with the custkey "
    "tiebreak",
)
def top_returned_revenue_customers(spark, sf_dir) -> DataFrame:
    """Top 20 customers by revenue on returned items in 1997 (TPC-H Q10
    analog)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    j = (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(scaled_sum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "linestatus_priority_counts",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    survey="extension (conditional counts): TPC-H Q12-shaped priority "
    "split — no l_shipmode column in this schema, so the category axis is "
    "l_linestatus (shape preserved: two CASE-gated counts over the "
    "orders-lineitem join in one aggregate pass); shipdate range pushed "
    "to the lineitem scan",
)
def linestatus_priority_counts(spark, sf_dir) -> DataFrame:
    """High- vs low-priority lineitem counts per line status for 1997
    shipments (TPC-H Q12 analog)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_linestatus")
    )


@register(
    "customer_order_count_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer
        LEFT JOIN orders ON o_custkey = c_custkey
                        AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    survey="extension (outer-join histogram): TPC-H Q13-shaped customer "
    "order-count distribution — LEFT OUTER join keeps zero-order "
    "customers (COUNT of the nullable key counts only matches), with the "
    "priority exclusion INSIDE the join condition (a WHERE would turn the "
    "outer join inner); double aggregation customer->count->histogram",
)
def customer_order_count_distribution(spark, sf_dir) -> DataFrame:
    """Distribution of non-LOW-priority order counts per customer,
    including zero-order customers (TPC-H Q13 analog)."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (orders.o_custkey == cust.c_custkey)
            & (orders.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "small_quantity_brand_revenue",
    oracle=f"""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                AS BIGINT) AS total_cents,
           ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                      AS DOUBLE) / 100.0 / 7.0, 6) AS avg_yearly
    FROM lineitem l JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = l.l_partkey)
    """,
    survey="extension (correlated scalar agg): TPC-H Q17-shaped "
    "small-order revenue — per-part average quantity as a correlated "
    "scalar subquery, decorrelated to one grouped aggregate joined back "
    "on partkey (never a per-row re-scan); the brand filter narrows the "
    "probe side before the join",
)
def small_quantity_brand_revenue(spark, sf_dir) -> DataFrame:
    """Revenue on Brand#1 lineitems whose quantity is below half the
    part's average quantity (TPC-H Q17 analog)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    # Decorrelated per-part threshold over ALL lineitems (the subquery in
    # the oracle is not brand-filtered — correlation is on partkey only).
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("qty_thresh")
    )
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(thresholds, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
    )
    total = F.sum(cents)
    return j.agg(
        total.alias("total_cents"),
        F.round(total.cast("double") / 100.0 / 7.0, 6).alias("avg_yearly"),
    )


@register(
    "bulk_part_supplier_shortlist",
    oracle="""
    SELECT s_name, n_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 100.0
    )
    ORDER BY s_name
    """,
    survey="extension (semi-join chain): TPC-H Q20-shaped bulk-supplier "
    "shortlist — no partsupp table in this schema, so availability is "
    "proxied by shipped volume (shape preserved: part-name LIKE filter -> "
    "grouped HAVING threshold -> IN planned as left-semi join into the "
    "supplier dim); only supplier keys travel through the semi-join",
)
def bulk_part_supplier_shortlist(spark, sf_dir) -> DataFrame:
    """Suppliers who shipped >100 units of 'small*' parts during 1997
    (TPC-H Q20 analog)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    bulk_keys = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100.0)
        .select("l_suppkey")
    )
    return (
        supp.join(bulk_keys, supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "part_value_concentration",
    oracle=f"""
    WITH nation_li AS (
        SELECT l.l_partkey,
               CAST(ROUND(({_REV}) * 100, 0) AS BIGINT) AS rev_cents
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_7'
    ),
    per_part AS (
        SELECT l_partkey, SUM(rev_cents) AS value_cents
        FROM nation_li GROUP BY l_partkey
    )
    SELECT l_partkey,
           CAST(value_cents AS DOUBLE) / 100.0 AS part_value
    FROM per_part
    WHERE value_cents * 1000 > (SELECT SUM(value_cents) FROM per_part)
    ORDER BY part_value DESC, l_partkey
    """,
    survey="extension (subqueries): TPC-H Q11-shaped value concentration "
    "— no partsupp table in this schema, so per-part 'inventory value' is "
    "proxied by NATION_7-supplied revenue (shape preserved: grouped sum + "
    "uncorrelated scalar-total threshold). The threshold compare stays in "
    "integer cents (value*1000 > total) so it is exact in both engines; "
    "the one-row total broadcasts, never a per-row re-aggregation",
)
def part_value_concentration(spark, sf_dir) -> DataFrame:
    """Parts whose NATION_7-supplied revenue exceeds 1/1000 of that
    nation's total (TPC-H Q11 analog)."""
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    rev_cents = F.round(
        F.expr(_REV) * F.lit(100), 0
    ).cast("long")
    per_part = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(rev_cents).alias("value_cents"))
    )
    total = per_part.agg(F.sum("value_cents").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * F.lit(1000) > F.col("total_cents"))
        .select(
            "l_partkey",
            (F.col("value_cents").cast("double") / 100.0).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@register(
    "supplier_variety_by_part_class",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    survey="extension (anti-join distinct aggregate): TPC-H Q16-shaped "
    "supplier variety — brand/type/size exclusion filters pushed into the "
    "part scan, the NOT IN complaint-supplier set (negative-balance proxy; "
    "no s_comment column in this schema) planned as a broadcast null-aware "
    "anti join BEFORE the distinct aggregate, so excluded suppliers never "
    "reach the shuffle; COUNT(DISTINCT) expands partial-agg-side",
)
def supplier_variety_by_part_class(spark, sf_dir) -> DataFrame:
    """Distinct supplier count per (brand, type, size) part class,
    excluding negative-balance suppliers (TPC-H Q16 analog)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad_suppliers = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(
            F.broadcast(bad_suppliers),
            li.l_suppkey == bad_suppliers.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "pareto_frontier_parts",
    oracle="""
    WITH pts AS (
      SELECT p_brand, CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents,
             CAST(p_size AS BIGINT) AS p_size, CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(MAX(p_size) AS BIGINT) AS msize
      FROM part GROUP BY p_brand, CAST(ROUND(p_retailprice * 100) AS BIGINT), p_size
    ),
    pp AS (
      SELECT p_brand, price_cents,
             CAST(MAX(msize) AS BIGINT) AS msize
      FROM pts GROUP BY p_brand, price_cents
    ),
    lt AS (
      SELECT p_brand, price_cents, msize,
             MAX(msize) OVER (PARTITION BY p_brand ORDER BY price_cents
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS m_lt
      FROM pp
    )
    SELECT p.p_brand, p.price_cents, p.p_size, p.n_parts
    FROM pts p
    JOIN lt ON lt.p_brand = p.p_brand AND lt.price_cents = p.price_cents
    WHERE p.p_size = lt.msize AND (lt.m_lt IS NULL OR lt.m_lt < p.p_size)
    ORDER BY p.p_brand, p.price_cents
    """,
    survey="extension (OLAP shape): per-brand skyline / Pareto frontier "
    "(minimize price, maximize size). Naive dominance is an O(n^2) "
    "inequality self-join; this is the sort-based rewrite — collapse to "
    "(brand, price) grain, one running-max window over the strictly-"
    "cheaper prefix, dominance check per row. One shuffle on brand, "
    "no range join anywhere. No reference analog",
)
def pareto_frontier_parts(spark, sf_dir) -> DataFrame:
    """Parts on the (cheapest, largest) frontier of their brand.

    A part survives iff it is the max size at its exact price AND every
    strictly cheaper same-brand part is strictly smaller."""
    part = t(spark, sf_dir, "part")
    pts = part.groupBy(
        "p_brand",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
        F.col("p_size").cast("long").alias("p_size"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
    ).withColumn("msize", F.col("p_size"))
    pp = pts.groupBy("p_brand", "price_cents").agg(
        F.max("msize").cast("long").alias("msize")
    )
    w = (
        Window.partitionBy("p_brand")
        .orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lt = pp.select(
        "p_brand", "price_cents", "msize", F.max("msize").over(w).alias("m_lt")
    )
    joined = pts.select("p_brand", "price_cents", "p_size", "n_parts").join(
        lt, ["p_brand", "price_cents"]
    )
    return (
        joined.filter(
            (F.col("p_size") == F.col("msize"))
            & (F.col("m_lt").isNull() | (F.col("m_lt") < F.col("p_size")))
        )
        .select("p_brand", "price_cents", "p_size", "n_parts")
        .orderBy("p_brand", "price_cents")
    )
