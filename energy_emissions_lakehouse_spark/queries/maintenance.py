"""Warehouse maintenance operators: incremental aggregate refresh and
bucket-checksum table reconciliation.

Reference analog: the reference reloads its Postgres marts in full each
run (src/30_load/load_to_postgres.py rebuilds every table); these two
operators are the 100 TB replacements — refresh an aggregate from the
delta alone, and find WHERE two table versions differ without comparing
them row by row.

Both are pure DataFrame algebra; the "two versions" are derived
deterministically from the orders table in-plan (same derivation in the
DuckDB oracle), so the queries stay self-contained against the shared
testdata while exercising the real merge/diff plan shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from energy_emissions_lakehouse_spark.registry import register
from energy_emissions_lakehouse_spark.tables import t

#: Aggregate-refresh cutover: rows strictly before this date are the
#: materialized base; rows on/after are the incoming delta batch.
IVM_CUTOFF = "1997-07-01"


@register(
    "incremental_agg_maintenance",
    oracle=f"""
    WITH base AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                 AS cents
      FROM orders WHERE o_orderdate < DATE '{IVM_CUTOFF}'
      GROUP BY o_orderpriority
    ),
    delta AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                 AS cents
      FROM orders WHERE o_orderdate >= DATE '{IVM_CUTOFF}'
      GROUP BY o_orderpriority
    ),
    merged AS (
      SELECT COALESCE(b.o_orderpriority, d.o_orderpriority)
                 AS o_orderpriority,
             CAST(COALESCE(b.n_orders, 0) + COALESCE(d.n_orders, 0) AS BIGINT)
                 AS n_orders,
             CAST(COALESCE(b.cents, 0) + COALESCE(d.cents, 0) AS BIGINT)
                 AS cents
      FROM base b FULL OUTER JOIN delta d USING (o_orderpriority)
    ),
    full_rebuild AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                 AS cents
      FROM orders GROUP BY o_orderpriority
    )
    SELECT m.o_orderpriority, m.n_orders,
           ROUND(CAST(m.cents AS DOUBLE) / 100.0, 2) AS total_price,
           (m.n_orders = f.n_orders AND m.cents = f.cents)
               AS matches_full_rebuild
    FROM merged m JOIN full_rebuild f USING (o_orderpriority)
    ORDER BY o_orderpriority
    """,
    survey="extension (maintenance): incremental aggregate refresh (IVM "
    "for distributive aggregates) — the materialized base aggregate "
    "merges with the delta batch's aggregate via a FULL OUTER key join "
    "(+ for COUNT/SUM), touching only the delta's scan at refresh time; "
    "the in-plan verdict pins merged == full-rebuild exactly (integer "
    "cents). At 100 TB the full rebuild rescans everything, the "
    "incremental path scans one day's arrivals. The reference reloads "
    "its marts in full (load_to_postgres.py)",
    tags=("maintenance",),
)
def incremental_agg_maintenance(spark, sf_dir) -> DataFrame:
    """Refresh the per-priority order aggregate from a delta batch and
    prove it equals the full recompute.

    The base/delta split simulates a materialized aggregate plus one
    ingest batch; the refresh itself is the FULL OUTER merge — the scan
    of `base_agg` in production is a read of the stored mart (O(groups)),
    never of base facts."""
    orders = t(spark, sf_dir, "orders")
    cents = F.sum(
        F.round(F.col("o_totalprice") * 100, 0).cast("long")
    ).cast("long")

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            cents.alias("cents"),
        )

    base = agg(orders.filter(F.col("o_orderdate") < F.lit(IVM_CUTOFF)))
    delta = agg(orders.filter(F.col("o_orderdate") >= F.lit(IVM_CUTOFF)))
    merged = (
        base.alias("b")
        .join(delta.alias("d"), "o_orderpriority", "full_outer")
        .select(
            "o_orderpriority",
            (
                F.coalesce(F.col("b.n_orders"), F.lit(0))
                + F.coalesce(F.col("d.n_orders"), F.lit(0))
            )
            .cast("long")
            .alias("n_orders"),
            (
                F.coalesce(F.col("b.cents"), F.lit(0))
                + F.coalesce(F.col("d.cents"), F.lit(0))
            )
            .cast("long")
            .alias("cents"),
        )
    )
    full_rebuild = agg(orders).withColumnRenamed(
        "n_orders", "f_n"
    ).withColumnRenamed("cents", "f_c")
    return (
        merged.join(full_rebuild, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_orders",
            F.round(F.col("cents").cast("double") / F.lit(100.0), 2).alias(
                "total_price"
            ),
            (
                (F.col("n_orders") == F.col("f_n"))
                & (F.col("cents") == F.col("f_c"))
            ).alias("matches_full_rebuild"),
        )
        .orderBy("o_orderpriority")
    )


#: Reconciliation geometry: rows hash into this many buckets; only buckets
#: whose checksums differ need row-level repair.
DIFF_BUCKETS = 64
#: Simulated divergence between the two table versions.
DIFF_TOUCH_MOD = 97  # every 97th key's price drifts by one cent in v2
DIFF_DROP_MOD = 101  # every 101st key is missing from v2

_FP_SQL = (
    "(('0x' || SUBSTR(MD5(CAST(o_orderkey AS VARCHAR) || '|' ||"
    " CAST(cents AS VARCHAR) || '|' || o_orderstatus), 1, 15))::BIGINT"
    " % 1099511627776)"
)


@register(
    "snapshot_diff_buckets",
    oracle=f"""
    WITH v1 AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
             o_orderstatus
      FROM orders
    ),
    v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % {DIFF_TOUCH_MOD} = 0
                  THEN cents + 1 ELSE cents END AS cents,
             o_orderstatus
      FROM v1 WHERE o_orderkey % {DIFF_DROP_MOD} != 0
    ),
    c1 AS (
      SELECT o_orderkey % {DIFF_BUCKETS} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n1,
             CAST(SUM({_FP_SQL}) AS BIGINT) AS sum1
      FROM v1 GROUP BY o_orderkey % {DIFF_BUCKETS}
    ),
    c2 AS (
      SELECT o_orderkey % {DIFF_BUCKETS} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n2,
             CAST(SUM({_FP_SQL}) AS BIGINT) AS sum2
      FROM v2 GROUP BY o_orderkey % {DIFF_BUCKETS}
    )
    SELECT c1.bucket, c1.n1 AS v1_rows, c2.n2 AS v2_rows,
           (c1.sum1 = c2.sum2 AND c1.n1 = c2.n2) AS in_sync
    FROM c1 JOIN c2 USING (bucket)
    WHERE NOT (c1.sum1 = c2.sum2 AND c1.n1 = c2.n2)
    ORDER BY c1.bucket
    """,
    survey="extension (maintenance): bucket-checksum table "
    "reconciliation — each version reduces to 64 (count, fingerprint-"
    "sum) bucket checksums (one map-side-combining groupBy per side, "
    "~KB crossing the network), and only mismatched buckets are "
    "reported for row-level repair. The anti-entropy pattern for "
    "verifying a 100 TB replica without moving 100 TB: comparison cost "
    "is O(buckets), re-sync cost is O(changed buckets). Fingerprints "
    "are md5-derived 40-bit ints so the BIGINT bucket sums can never "
    "overflow at any realistic row count",
    tags=("maintenance",),
)
def snapshot_diff_buckets(spark, sf_dir) -> DataFrame:
    """Buckets where two versions of the orders table diverge.

    v2 is derived in-plan (deterministic price drift + dropped keys) so
    the query is self-contained; in production v1/v2 are a table and its
    replica. Row fingerprint covers the compared payload columns; a
    per-bucket SUM of fingerprints is order-independent and mergeable,
    so each side needs exactly one scan."""
    orders = t(spark, sf_dir, "orders")
    v1 = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        "o_orderstatus",
    )
    v2 = v1.filter(F.col("o_orderkey") % DIFF_DROP_MOD != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % DIFF_TOUCH_MOD == 0, F.col("cents") + 1
        )
        .otherwise(F.col("cents"))
        .alias("cents"),
        "o_orderstatus",
    )
    fp = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("o_orderkey").cast("string"),
                        F.col("cents").cast("string"),
                        F.col("o_orderstatus"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(1099511627776)
    )

    def checksums(df: DataFrame, n: str, s: str) -> DataFrame:
        return df.groupBy(
            (F.col("o_orderkey") % DIFF_BUCKETS).alias("bucket")
        ).agg(
            F.count(F.lit(1)).cast("long").alias(n),
            F.sum(fp).cast("long").alias(s),
        )

    c1 = checksums(v1, "v1_rows", "sum1")
    c2 = checksums(v2, "v2_rows", "sum2")
    in_sync = (F.col("sum1") == F.col("sum2")) & (
        F.col("v1_rows") == F.col("v2_rows")
    )
    return (
        c1.join(c2, "bucket")
        .select("bucket", "v1_rows", "v2_rows", in_sync.alias("in_sync"))
        .filter(~F.col("in_sync"))
        .orderBy("bucket")
    )


# ------------------------------------------- SCD2 point-in-time fact join

#: SCD2 version cutover for the synthesized customer-dimension history.
SCD2_CUTOVER = "1996-01-01"


@register(
    "scd2_point_in_time_join",
    oracle=f"""
    WITH dim AS (
      SELECT c_custkey, 1 AS version_id,
             DATE '1992-01-01' AS valid_from, DATE '{SCD2_CUTOVER}' AS valid_to,
             CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
      FROM customer
      UNION ALL
      SELECT c_custkey, 2,
             DATE '{SCD2_CUTOVER}', DATE '9999-12-31',
             CAST(ROUND(c_acctbal * 110, 0) AS BIGINT)
      FROM customer
    )
    SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS order_year,
           CAST(d.version_id AS BIGINT) AS version_id,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
           CAST(SUM(d.bal_cents) AS BIGINT) AS bal_cents_at_order
    FROM orders o
    JOIN dim d ON d.c_custkey = o.o_custkey
              AND o.o_orderdate >= d.valid_from
              AND o.o_orderdate < d.valid_to
    GROUP BY YEAR(o.o_orderdate), d.version_id
    ORDER BY order_year, version_id
    """,
    survey="extension (warehouse): SCD2 point-in-time fact join — each "
    "fact row joins the dimension VERSION that was valid at its event "
    "date: equi-join on the business key + validity-interval predicate. "
    "The equi-join carries the shuffle (hash on custkey); the interval "
    "check filters the O(versions-per-key) candidates post-match, so "
    "the plan is a plain hash join however long the history grows — "
    "never a range join. Dim versions synthesized in-plan (both "
    "engines identically); pairs with scd2_user_event_type_history, "
    "which BUILDS such intervals",
    tags=("maintenance",),
)
def scd2_point_in_time_join(spark, sf_dir) -> DataFrame:
    """Orders joined to their point-in-time customer-dimension version;
    yearly rollup proves every fact matched exactly one version.

    `bal_cents_at_order` totals the version-correct attribute — the
    number that silently goes wrong when a warehouse joins facts to
    is_current dimensions instead of PIT versions."""
    cust = t(spark, sf_dir, "customer")
    v1 = cust.select(
        "c_custkey",
        F.lit(1).alias("version_id"),
        F.lit("1992-01-01").cast("date").alias("valid_from"),
        F.lit(SCD2_CUTOVER).cast("date").alias("valid_to"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal_cents"),
    )
    v2 = cust.select(
        "c_custkey",
        F.lit(2).alias("version_id"),
        F.lit(SCD2_CUTOVER).cast("date").alias("valid_from"),
        F.lit("9999-12-31").cast("date").alias("valid_to"),
        F.round(F.col("c_acctbal") * 110, 0).cast("long").alias("bal_cents"),
    )
    dim = v1.unionAll(v2)
    orders = t(spark, sf_dir, "orders")
    joined = orders.join(
        dim,
        (orders.o_custkey == dim.c_custkey)
        & (orders.o_orderdate >= dim.valid_from)
        & (orders.o_orderdate < dim.valid_to),
    )
    return (
        joined.groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.col("version_id").cast("long").alias("version_id"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
            F.sum("bal_cents").cast("long").alias("bal_cents_at_order"),
        )
        .orderBy("order_year", "version_id")
    )


# -------------------------------------------- join-key containment audit

#: A candidate passes the FK sniff test above this containment (ppm).
FK_PPM_THRESHOLD = 990_000


@register(
    "fk_containment_audit",
    oracle=f"""
    WITH cands AS (
      SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS candidate,
             (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS n_child,
             (SELECT COUNT(*) FROM
                (SELECT DISTINCT l_orderkey FROM lineitem) c
                JOIN (SELECT DISTINCT o_orderkey FROM orders) p
                  ON c.l_orderkey = p.o_orderkey) AS n_contained
      UNION ALL
      SELECT 'orders.o_custkey->customer.c_custkey',
             (SELECT COUNT(DISTINCT o_custkey) FROM orders),
             (SELECT COUNT(*) FROM
                (SELECT DISTINCT o_custkey FROM orders) c
                JOIN (SELECT DISTINCT c_custkey FROM customer) p
                  ON c.o_custkey = p.c_custkey)
      UNION ALL
      SELECT 'orders.o_orderkey->customer.c_custkey',
             (SELECT COUNT(DISTINCT o_orderkey) FROM orders),
             (SELECT COUNT(*) FROM
                (SELECT DISTINCT o_orderkey FROM orders) c
                JOIN (SELECT DISTINCT c_custkey FROM customer) p
                  ON c.o_orderkey = p.c_custkey)
    )
    SELECT candidate,
           CAST(n_child AS BIGINT) AS n_child_keys,
           CAST(n_contained AS BIGINT) AS n_contained,
           CAST((n_contained * 1000000) // n_child AS BIGINT)
               AS containment_ppm,
           (n_contained * 1000000) // n_child >= {FK_PPM_THRESHOLD}
               AS is_fk_like
    FROM cands
    ORDER BY candidate
    """,
    survey="extension (profiling): foreign-key containment audit — for "
    "each candidate (child.col -> parent.col) pair, containment = "
    "|distinct child ∩ distinct parent| / |distinct child| in integer "
    "ppm, computed on DISTINCT key sets (aggregate-before-join: the "
    "join input is key-cardinality, not fact-cardinality). The "
    "schema-inference pass that discovers joinable keys in an "
    "un-documented lake; verdict flags containment >= 99%. True FKs "
    "score 1e6 ppm; the control (orderkey vs custkey — id ranges that "
    "merely overlap at the bottom) scores low at every SF",
    tags=("maintenance",),
)
def fk_containment_audit(spark, sf_dir) -> DataFrame:
    """Containment profile of three candidate FK relationships (two real,
    one negative control)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")

    def containment(name: str, child, parent) -> DataFrame:
        c = child.distinct()
        p = parent.distinct()
        c_col, p_col = c.columns[0], p.columns[0]
        n_child = c.agg(F.count(F.lit(1)).cast("long").alias("n_child_keys"))
        n_cont = (
            c.join(p, F.col(c_col) == F.col(p_col))
            .agg(F.count(F.lit(1)).cast("long").alias("n_contained"))
        )
        return (
            n_child.crossJoin(n_cont)
            .select(
                F.lit(name).alias("candidate"),
                "n_child_keys",
                "n_contained",
                F.expr("CAST((n_contained * 1000000) div n_child_keys AS BIGINT)")
                .alias("containment_ppm"),
            )
            .withColumn(
                "is_fk_like", F.col("containment_ppm") >= FK_PPM_THRESHOLD
            )
        )

    out = containment(
        "lineitem.l_orderkey->orders.o_orderkey",
        li.select("l_orderkey"),
        orders.select("o_orderkey"),
    ).unionAll(
        containment(
            "orders.o_custkey->customer.c_custkey",
            orders.select("o_custkey"),
            cust.select("c_custkey"),
        )
    ).unionAll(
        containment(
            "orders.o_orderkey->customer.c_custkey",
            orders.select("o_orderkey"),
            cust.select("c_custkey"),
        )
    )
    return out.orderBy("candidate")
