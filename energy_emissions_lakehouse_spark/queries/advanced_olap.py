"""Advanced OLAP + training-pipeline aggregation surface.

Three extension families beyond the reference (which has no grouping sets,
no sketches, and only one unkeyed Bernoulli sample — SURVEY.md §2.6/§2.10):

- **GROUPING SETS** — arbitrary subtotal lattices in one shuffle; Spark
  expands the sets map-side, so the cost is one pass regardless of how many
  subtotal combinations are requested.
- **Mergeable sketches (Apache DataSketches HLL)** — the canonical 100 TB
  distinct-counting pattern: each partition builds a fixed-size sketch,
  sketches merge associatively (partial aggregation, then cross-group
  ``hll_union_agg``), and nothing resembling the raw key set ever moves.
  An exact ``count(distinct)`` of the same key shuffles every distinct
  value; sketches shuffle kilobytes.
- **Deterministic stratified sampling** — per-stratum keep rates applied by
  hashing a stable key, the training-data-curation primitive ("downsample
  the dominant language, keep the rare ones"). Hash-threshold selection is
  reproducible across engines, cluster sizes, and reruns — unlike
  ``df.sampleBy``, whose Bernoulli draw is seed+partitioning dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from energy_emissions_lakehouse_spark.functions.exact import scaled_sum_sql
from energy_emissions_lakehouse_spark.registry import register
from energy_emissions_lakehouse_spark.tables import t

#: Per-language keep rates in permille ("downsample en, thin zh, keep the
#: rest"): the stratum is the partition column a real corpus job would use.
STRATA_PERMILLE = {"en": 250, "zh": 600}
DEFAULT_PERMILLE = 1000


@register(
    "grouping_sets_revenue",
    oracle=f"""
    SELECT ship_year, l_returnflag,
           CAST(GROUPING(ship_year) * 2 + GROUPING(l_returnflag) AS BIGINT)
               AS gid,
           {scaled_sum_sql('disc_price')} AS revenue,
           COUNT(*) AS n_items
    FROM (
        SELECT CAST(YEAR(l_shipdate) AS BIGINT) AS ship_year,
               l_returnflag,
               l_extendedprice * (1.0 - l_discount) AS disc_price
        FROM lineitem
    )
    GROUP BY GROUPING SETS ((ship_year, l_returnflag), (ship_year),
                            (l_returnflag), ())
    """,
    survey="extension (OLAP): GROUPING SETS — the full subtotal lattice "
    "(detail, each 1-D margin, grand total) in ONE shuffle; GROUPING() "
    "bits disambiguate real nulls from subtotal rows. Generalizes the "
    "rollup/cube queries; no reference analog (SURVEY §2.6: none)",
)
def grouping_sets_revenue(spark, sf_dir) -> DataFrame:
    """Spark SQL GROUPING SETS over a projected view. The pre-projection
    (ship_year, disc_price) keeps the grouping keys plain columns so the
    GROUPING() bit positions line up across engines."""
    t(spark, sf_dir, "lineitem").select(
        F.year("l_shipdate").cast("long").alias("ship_year"),
        "l_returnflag",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
            "disc_price"
        ),
    ).createOrReplaceTempView("eel_li_gs")
    return spark.sql(
        f"""
        SELECT ship_year, l_returnflag,
               CAST(GROUPING(ship_year) * 2 + GROUPING(l_returnflag) AS BIGINT)
                   AS gid,
               {scaled_sum_sql('disc_price')} AS revenue,
               COUNT(*) AS n_items
        FROM eel_li_gs
        GROUP BY GROUPING SETS ((ship_year, l_returnflag), (ship_year),
                                (l_returnflag), ())
        """
    )


@register(
    "hll_sketch_distinct_custkeys",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS exact_distinct,
           TRUE AS approx_within_8pct
    FROM orders
    GROUP BY o_orderpriority
    UNION ALL
    SELECT 'ALL', COUNT(DISTINCT o_custkey), TRUE FROM orders
    """,
    survey="extension (sketches): Apache DataSketches HLL — per-group "
    "hll_sketch_agg + cross-group hll_union_agg. Mergeable fixed-size state "
    "is the 100 TB distinct path (exact distinct shuffles the key set; "
    "the sketch shuffles ~KB). Deterministic-verdict oracle: exact counts "
    "hash-match DuckDB; the boolean pins each estimate (incl. the merged "
    "ALL sketch) within 8% rel. error (~5 sigma of the lgK=12 rsd — the "
    "verdict is a hard driver gate, so the band is sized to never "
    "flake on regenerated data while still pinning sketch sanity)",
)
def hll_sketch_distinct_custkeys(spark, sf_dir) -> DataFrame:
    """Distinct customers per order priority via HLL sketches, plus an ALL
    row whose sketch is the UNION of the per-group sketches — demonstrating
    that group sketches re-aggregate without touching the raw keys. Output
    is the exact count + a within-bound verdict so the driver can
    hash-match it against DuckDB (the raw estimate is engine-specific)."""
    orders = t(spark, sf_dir, "orders")
    sk = orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count_distinct("o_custkey").alias("exact_distinct"),
    )
    within = lambda est, exact: (  # noqa: E731
        F.abs(est - exact) <= F.greatest(F.lit(1.0), exact * F.lit(0.08))
    )
    per_group = sk.select(
        "o_orderpriority",
        "exact_distinct",
        within(F.hll_sketch_estimate("sk"), F.col("exact_distinct")).alias(
            "approx_within_8pct"
        ),
    )
    overall = (
        sk.agg(F.hll_union_agg("sk").alias("u"))
        .crossJoin(
            F.broadcast(
                orders.agg(F.count_distinct("o_custkey").alias("exact_distinct"))
            )
        )
        .select(
            F.lit("ALL").alias("o_orderpriority"),
            "exact_distinct",
            within(F.hll_sketch_estimate("u"), F.col("exact_distinct")).alias(
                "approx_within_8pct"
            ),
        )
    )
    return per_group.unionByName(overall)


@register(
    "stratified_sample_documents",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(CASE WHEN ('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000
                           < (CASE lang WHEN 'en' THEN {STRATA_PERMILLE['en']}
                                        WHEN 'zh' THEN {STRATA_PERMILLE['zh']}
                                        ELSE {DEFAULT_PERMILLE} END)
                      THEN 1 END) AS n_kept,
           CAST(SUM(CASE WHEN ('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000
                              < (CASE lang WHEN 'en' THEN {STRATA_PERMILLE['en']}
                                           WHEN 'zh' THEN {STRATA_PERMILLE['zh']}
                                           ELSE {DEFAULT_PERMILLE} END)
                         THEN n_chars END) AS BIGINT) AS kept_chars
    FROM documents
    GROUP BY lang
    """,
    survey="extension (training pipeline): deterministic stratified "
    "sampling — per-language keep rates via md5-hash thresholding on the "
    "stable doc_id. Reproducible across engines/cluster layouts/reruns "
    "(df.sampleBy is not); map-only, no shuffle beyond the audit rollup. "
    "Reference has one Bernoulli sample (SURVEY §2.10 R1)",
)
def stratified_sample_documents(spark, sf_dir) -> DataFrame:
    """Keep-decision = hash(doc_id) mod 1000 < rate(lang). The audit output
    (per-lang totals, kept counts, kept chars) is what a curation job logs;
    the kept rows themselves are the same filter without the groupBy."""
    docs = t(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    rate = (
        F.when(F.col("lang") == "en", F.lit(STRATA_PERMILLE["en"]))
        .when(F.col("lang") == "zh", F.lit(STRATA_PERMILLE["zh"]))
        .otherwise(F.lit(DEFAULT_PERMILLE))
    )
    keep = (h % 1000) < rate
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(keep, 1)).alias("n_kept"),
        F.sum(F.when(keep, F.col("n_chars"))).alias("kept_chars"),
    )


@register(
    "theta_sketch_repeat_customers",
    oracle="""
    WITH yearly AS (
        SELECT o_custkey, YEAR(o_orderdate) AS yr FROM orders
    ),
    ab AS (
        SELECT COUNT(DISTINCT CASE WHEN yr = 1997 THEN o_custkey END)
                   AS exact_1997,
               COUNT(DISTINCT CASE WHEN yr = 1998 THEN o_custkey END)
                   AS exact_1998
        FROM yearly
    ),
    both_tbl AS (
        SELECT CAST(COUNT(CASE WHEN ny = 2 THEN 1 END) AS BIGINT)
                   AS exact_both,
               COUNT(*) AS exact_either
        FROM (
            SELECT o_custkey, COUNT(DISTINCT yr) AS ny
            FROM yearly WHERE yr IN (1997, 1998)
            GROUP BY o_custkey
        )
    )
    SELECT exact_1997, exact_1998, exact_both, exact_either,
           TRUE AS ok_1997, TRUE AS ok_1998, TRUE AS ok_both, TRUE AS ok_either
    FROM ab CROSS JOIN both_tbl
    """,
    survey="extension (sketches): Apache DataSketches Theta — mergeable "
    "distinct sketches that also support INTERSECTION and DIFFERENCE "
    "(HLL can only union). One row carries exact counts for 1997 buyers, "
    "1998 buyers, their intersection (repeat customers) and union — "
    "hash-matched against DuckDB — plus booleans pinning each sketch "
    "estimate within 9% rel. error (wide ~5-sigma band: the boolean is a "
    "hard driver gate, the tight accuracy canary lives in pytest). At 100 TB the year sketches come from "
    "partial aggregation per partition and the set algebra runs on ~KB of "
    "sketch state, never the key sets",
)
def theta_sketch_repeat_customers(spark, sf_dir) -> DataFrame:
    """Repeat-customer analysis as sketch set algebra. The exact columns
    (computed here to anchor the verdict) are the expensive path the
    sketches replace: each needs a full distinct shuffle. Only exact counts
    and within-bound booleans are emitted so DuckDB can hash-match."""
    orders = t(spark, sf_dir, "orders").select(
        "o_custkey", F.year("o_orderdate").alias("yr")
    )
    sk = orders.agg(
        F.theta_sketch_agg(F.when(F.col("yr") == 1997, F.col("o_custkey"))).alias("a"),
        F.theta_sketch_agg(F.when(F.col("yr") == 1998, F.col("o_custkey"))).alias("b"),
        F.count_distinct(F.when(F.col("yr") == 1997, F.col("o_custkey"))).alias(
            "exact_1997"
        ),
        F.count_distinct(F.when(F.col("yr") == 1998, F.col("o_custkey"))).alias(
            "exact_1998"
        ),
    )
    both = (
        orders.filter(F.col("yr").isin(1997, 1998))
        .groupBy("o_custkey")
        .agg(F.count_distinct("yr").alias("ny"))
        .agg(
            F.count(F.when(F.col("ny") == 2, 1)).alias("exact_both"),
            F.count(F.lit(1)).alias("exact_either"),
        )
    )
    within = lambda est, exact: (  # noqa: E731
        F.abs(est - exact) <= F.greatest(F.lit(1.0), exact * F.lit(0.09))
    )
    return sk.crossJoin(F.broadcast(both)).select(
        "exact_1997",
        "exact_1998",
        "exact_both",
        "exact_either",
        within(F.theta_sketch_estimate("a"), F.col("exact_1997")).alias("ok_1997"),
        within(F.theta_sketch_estimate("b"), F.col("exact_1998")).alias("ok_1998"),
        within(
            F.theta_sketch_estimate(F.theta_intersection("a", "b")),
            F.col("exact_both"),
        ).alias("ok_both"),
        within(
            F.theta_sketch_estimate(F.theta_union("a", "b")),
            F.col("exact_either"),
        ).alias("ok_either"),
    )


# ------------------------------------------------------------- count-min

#: Count-min geometry: D independent hash rows x W counters. Error bound:
#: est - exact <= e/W * total_occurrences with prob 1 - (1/2)^D-ish; at
#: W=512 over this corpus the overestimate is tiny, and the structural
#: guarantee est >= exact is EXACT (pinned as a hard boolean).
CM_DEPTH = 4
CM_WIDTH = 512
_CM_P = 2_147_483_647
#: Reuse the MinHash affine-hash constants (operators/dedup.py) — same
#: cross-engine-exact integer family.
from energy_emissions_lakehouse_spark.operators import dedup as _dd  # noqa: E402

_CM_TOKS = "string_split_regex(lower(text), '\\W+')"


def _cm_col_sql(d: int) -> str:
    a, b = _dd.MINHASH_A[d], _dd.MINHASH_B[d]
    return (
        f"((({_dd.hash_id_sql('term')} % {_CM_P}) * {a} + {b})"
        f" % {_CM_P}) % {CM_WIDTH}"
    )


@register(
    "countmin_heavy_hitter_terms",
    oracle=f"""
    WITH tok_ex AS (
      SELECT unnest({_CM_TOKS}) AS term FROM documents
    ),
    rows_ex AS (
      SELECT term, d, {'CASE ' + ' '.join(f'WHEN d = {d} THEN ({_cm_col_sql(d)})' for d in range(CM_DEPTH))} END AS col
      FROM tok_ex CROSS JOIN (SELECT unnest(range(0, {CM_DEPTH})) AS d)
    ),
    sketch AS (
      SELECT d, col, CAST(COUNT(*) AS BIGINT) AS counter
      FROM rows_ex GROUP BY d, col
    ),
    exact AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS exact_count
      FROM tok_ex GROUP BY term
    ),
    probes AS (
      SELECT e.term, e.exact_count, p.d,
             {'CASE ' + ' '.join(f'WHEN p.d = {d} THEN ({_cm_col_sql(d).replace("term", "e.term")})' for d in range(CM_DEPTH))} END AS col
      FROM exact e CROSS JOIN (SELECT unnest(range(0, {CM_DEPTH})) AS d) p
    ),
    est AS (
      SELECT p.term, p.exact_count,
             CAST(MIN(s.counter) AS BIGINT) AS cm_estimate
      FROM probes p JOIN sketch s ON p.d = s.d AND p.col = s.col
      GROUP BY p.term, p.exact_count
    )
    SELECT term, cm_estimate, exact_count,
           cm_estimate >= exact_count AS never_underestimates
    FROM est
    ORDER BY cm_estimate DESC, term
    LIMIT 10
    """,
    survey="extension (sketches): COUNT-MIN heavy hitters — D x W integer "
    "counter matrix built by one map-side-combining groupBy (<= D*W "
    "groups however large the corpus: the mergeable-summary shape), "
    "candidate frequencies estimated as min over the D probed counters "
    "(equi-join on (d, col), never a scan of raw occurrences), top-10 by "
    "estimate with the est >= exact one-sided guarantee pinned as a hard "
    "boolean. Completes the sketch family (HLL distinct, Theta set "
    "algebra, KLL quantiles). No reference analog",
    tags=("sketches",),
)
def countmin_heavy_hitter_terms(spark, sf_dir) -> DataFrame:
    """Top-10 most frequent tokens by count-min estimate, with exact counts
    alongside. All arithmetic is integer (md5-derived ids, affine hashes
    mod P mod W, BIGINT counters) so Spark and DuckDB agree bit-for-bit.
    At 100 TB the sketch build shuffles at most D*W rows after partial
    aggregation; the estimate pass touches only candidates x D rows."""
    from energy_emissions_lakehouse_spark.operators import text as tx
    from energy_emissions_lakehouse_spark.tables import t as _t

    docs = _t(spark, sf_dir, "documents")
    tok_ex = docs.select(F.explode(tx.tokens(F.col("text"))).alias("term"))

    def cm_col(term, d: int):
        a, b = _dd.MINHASH_A[d], _dd.MINHASH_B[d]
        return (((_dd.hash_id(term) % _CM_P) * a + b) % _CM_P) % CM_WIDTH

    rows_ex = tok_ex.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        cm_col(F.col("term"), d).alias("col"),
                    )
                    for d in range(CM_DEPTH)
                ]
            )
        ).alias("dc")
    ).select("dc.d", "dc.col")
    sketch = rows_ex.groupBy("d", "col").agg(
        F.count(F.lit(1)).cast("long").alias("counter")
    )
    exact = tok_ex.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    probes = exact.select(
        "term",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        cm_col(F.col("term"), d).alias("col"),
                    )
                    for d in range(CM_DEPTH)
                ]
            )
        ).alias("dc"),
    ).select("term", "exact_count", "dc.d", "dc.col")
    est = (
        probes.join(F.broadcast(sketch), ["d", "col"])
        .groupBy("term", "exact_count")
        .agg(F.min("counter").cast("long").alias("cm_estimate"))
    )
    return (
        est.select(
            "term",
            "cm_estimate",
            "exact_count",
            (F.col("cm_estimate") >= F.col("exact_count")).alias(
                "never_underestimates"
            ),
        )
        .orderBy(F.col("cm_estimate").desc(), "term")
        .limit(10)
    )


# ------------------------------------------- weighted reservoir sampling

#: Per-stratum draw count for the weighted sample.
WSAMPLE_K = 3
#: 48-bit uniform from the stable key: u = (h48 + 1) / 2^48 in (0, 1].
_WS_U_SQL = (
    "((('0x' || SUBSTR(MD5(CAST(p_partkey AS VARCHAR)), 1, 12))::BIGINT + 1)"
    " / 281474976710656.0)"
)


@register(
    "weighted_sample_parts",
    oracle=f"""
    WITH keyed AS (
      SELECT p_brand, p_partkey, CAST(p_size AS BIGINT) AS p_size,
             CAST(ROUND(-LN({_WS_U_SQL}) * 1000000000.0, 0) AS BIGINT)
                 AS exp_nano
      FROM part
    ),
    ranked AS (
      SELECT p_brand, p_partkey, p_size,
             ROW_NUMBER() OVER (
               PARTITION BY p_brand
               ORDER BY CAST(exp_nano AS DOUBLE) / CAST(p_size AS DOUBLE),
                        p_partkey) AS draw_rank
      FROM keyed
    )
    SELECT p_brand, CAST(draw_rank AS BIGINT) AS draw_rank, p_partkey, p_size
    FROM ranked WHERE draw_rank <= {WSAMPLE_K}
    ORDER BY p_brand, draw_rank
    """,
    survey="extension (training pipeline): weighted sampling without "
    "replacement per stratum (Efraimidis-Skerivanos exponential-clocks "
    "form: priority = Exp(1)/weight, keep the K smallest per group) — "
    "the draw is a DETERMINISTIC function of the stable key (md5-derived "
    "48-bit uniform -> -ln(u), quantized to nano like the BM25 LN "
    "policy), so the sample is reproducible across engines, reruns, and "
    "cluster layouts, and selection probability is proportional to "
    "weight. Map-only priority computation + per-stratum top-K window; "
    "no reference analog (R1 is one unweighted Bernoulli sample)",
)
def weighted_sample_parts(spark, sf_dir) -> DataFrame:
    """Draw 3 parts per brand with probability proportional to p_size.

    Exponential-clocks weighted sampling: u~U(0,1] from a 48-bit hash of
    the key (48 bits so the int->double conversion is exact), priority =
    -ln(u)/w, keep the K smallest per stratum. At scale this is a
    map-side expression + grouped top-K (no total sort; partial
    aggregation prunes before the shuffle)."""
    part = t(spark, sf_dir, "part")
    h48 = F.conv(
        F.substring(F.md5(F.col("p_partkey").cast("string")), 1, 12), 16, 10
    ).cast("long")
    u = (h48 + F.lit(1)).cast("double") / F.lit(281474976710656.0)
    exp_nano = F.round(-F.log(u) * F.lit(1e9), 0).cast("long")
    keyed = part.select(
        "p_brand",
        "p_partkey",
        F.col("p_size").cast("long").alias("p_size"),
        exp_nano.alias("exp_nano"),
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("exp_nano").cast("double") / F.col("p_size").cast("double"),
        F.col("p_partkey"),
    )
    return (
        keyed.select(
            "p_brand",
            F.row_number().over(w).cast("long").alias("draw_rank"),
            "p_partkey",
            "p_size",
        )
        .filter(F.col("draw_rank") <= WSAMPLE_K)
        .orderBy("p_brand", "draw_rank")
    )


# ------------------------------------------- bottom-k uniform sampling

#: Global sample size for the bottom-k sketch.
BOTTOMK_K = 100
_BK_U_SQL = (
    "((('0x' || SUBSTR(MD5(CAST(o_orderkey AS VARCHAR)), 1, 12))::BIGINT + 1)"
    " / 281474976710656.0)"
)


@register(
    "bottomk_sample_orders",
    oracle=f"""
    WITH s AS (
      SELECT o_orderkey, o_totalprice, {_BK_U_SQL} AS u
      FROM orders ORDER BY u, o_orderkey LIMIT {BOTTOMK_K}
    ),
    m AS (SELECT MAX(u) AS uk FROM s)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY u, o_orderkey) AS BIGINT)
               AS sample_rank,
           o_orderkey, o_totalprice, u,
           CAST(ROUND(({BOTTOMK_K} - 1) / m.uk, 0) AS BIGINT)
               AS est_total_rows
    FROM s, m
    """,
    survey="extension (training pipeline): GLOBAL uniform sample without "
    "replacement via the bottom-k-by-hash sketch (KMV) — keep the K rows "
    "with the smallest hash-derived uniforms; deterministic, mergeable "
    "(per-partition top-K then driver merge, never a total sort), and the "
    "k-th order statistic doubles as an unbiased population-size "
    "estimator ((K-1)/u_(K)); complements the per-stratum/per-weight "
    "samplers with the coordinated GLOBAL draw (same hash -> samples of "
    "different tables/runs are consistent, the KMV join-synopsis trick)",
)
def bottomk_sample_orders(spark, sf_dir) -> DataFrame:
    """Bottom-K (K-minimum-values) global sample of ``orders``.

    u = (h48+1)/2^48 from md5(o_orderkey) — the same engine-portable
    48-bit uniform as weighted_sample_parts, so the draw is reproducible
    across engines, reruns, and cluster layouts, and COORDINATED: joining
    two tables' bottom-k samples by the shared key yields a uniform sample
    of the join.  Plan: map-side expression + ``orderBy(u).limit(K)`` =
    TakeOrderedAndProject (each task keeps its local top-K, the driver
    merges K·tasks rows) — no global sort, no shuffle of the full table at
    any scale.  The closing rank/max window runs over the K-row result
    (single tiny partition, deliberate)."""
    orders = t(spark, sf_dir, "orders")
    h48 = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 12), 16, 10
    ).cast("long")
    u = (h48 + F.lit(1)).cast("double") / F.lit(281474976710656.0)
    s = (
        orders.select("o_orderkey", "o_totalprice", u.alias("u"))
        .orderBy("u", "o_orderkey")
        .limit(BOTTOMK_K)
    )
    w = Window.orderBy("u", "o_orderkey")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return s.select(
        F.row_number().over(w).cast("long").alias("sample_rank"),
        "o_orderkey",
        "o_totalprice",
        "u",
        F.round((F.lit(BOTTOMK_K) - 1) / F.max("u").over(wall), 0)
        .cast("long")
        .alias("est_total_rows"),
    )


# --------------------------------------- rolling distinct via HLL merging

#: Trailing window width in days for the rolling-distinct rollup.
ROLLING_DAYS = 7


@register(
    "rolling_distinct_users_hll",
    oracle=f"""
    WITH days AS (
      SELECT DISTINCT DATE_TRUNC('day', ts) AS day_ts FROM events
    ),
    user_days AS (
      SELECT DISTINCT DATE_TRUNC('day', ts) AS day_ts, user_id FROM events
    ),
    exact AS (
      SELECT d.day_ts, COUNT(DISTINCT u.user_id) AS exact_users
      FROM days d JOIN user_days u
        ON u.day_ts BETWEEN d.day_ts - INTERVAL {ROLLING_DAYS - 1} DAY
                        AND d.day_ts
      GROUP BY d.day_ts
    )
    SELECT day_ts, exact_users, TRUE AS approx_within_8pct
    FROM exact ORDER BY day_ts
    """,
    survey="extension (sketches): trailing-7-day rolling distinct users "
    "via HLL sketch merging — ONE pass builds a KB-sized sketch per day, "
    "then each day's window unions 7 daily sketches (map-side offset "
    "fan-out + hll_union_agg equi-join group), so the raw user keys are "
    "scanned exactly once however wide the window. The exact recompute "
    "(for the verdict) re-touches every (day, user) pair per window — "
    "the cost the sketch path avoids at 100 TB. Estimate pinned within "
    "8% as a hard verdict, same policy as hll_sketch_distinct_custkeys",
)
def rolling_distinct_users_hll(spark, sf_dir) -> DataFrame:
    """Rolling 7-day distinct users per day: HLL estimate vs exact.

    The sketch path scans events once (daily sketches, ~KB each),
    fans each day out to the <=7 window ends it contributes to (integer
    offset explode — an equi-join, not a range join), and merges with
    hll_union_agg. Output is the exact count + within-band verdict so
    the driver hash-compares engine-neutral values."""
    ev = t(spark, sf_dir, "events")
    daily_sk = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day_ts")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    fan = daily_sk.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(ROLLING_DAYS - 1))
        ).alias("off"),
        "day_ts",
        "sk",
    ).select(
        F.expr("day_ts + make_interval(0, 0, 0, off)").alias("win_end"),
        "sk",
    )
    merged = fan.groupBy("win_end").agg(F.hll_union_agg("sk").alias("u"))

    user_days = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day_ts"), "user_id"
    ).distinct()
    days = user_days.select("day_ts").distinct()
    exact = (
        days.alias("d")
        .join(
            user_days.alias("u"),
            (F.col("u.day_ts") <= F.col("d.day_ts"))
            & (
                F.col("u.day_ts")
                >= F.col("d.day_ts")
                - F.expr(f"INTERVAL {ROLLING_DAYS - 1} DAY")
            ),
        )
        .groupBy(F.col("d.day_ts").alias("day_ts"))
        .agg(F.count_distinct("user_id").alias("exact_users"))
    )
    out = exact.join(
        merged, exact.day_ts == merged.win_end, "inner"
    ).select(
        "day_ts",
        "exact_users",
        (
            F.abs(F.hll_sketch_estimate("u") - F.col("exact_users"))
            <= F.greatest(F.lit(1.0), F.col("exact_users") * F.lit(0.08))
        ).alias("approx_within_8pct"),
    )
    return out.orderBy("day_ts")


# --------------------------------------------------- Poisson bootstrap CI

#: Bootstrap replicate count.
BOOT_B = 32
#: Poisson(1) inverse-CDF thresholds on the LCG's 2^31-1 uniform scale:
#: k = #{thresholds below u}, capped at len(thresholds).
import math as _math

_POIS_CDF = []
_acc = 0.0
for _k in range(6):
    _acc += _math.exp(-1.0) / _math.factorial(_k)
    _POIS_CDF.append(_acc)
_LCG_M = 2147483647
POIS_THRESH = tuple(int(c * _LCG_M) for c in _POIS_CDF)

#: Two-step LCG uniform from the (row, replicate) key — the same
#: overflow-safe integer generator the synthetic medallion source uses
#: (medallion/generate.py): products stay < 2^62, so Spark (non-ANSI)
#: and DuckDB both evaluate it exactly. An md5 per (row, replicate) was
#: the first implementation and dominated the query at 4.8M hashes
#: (14.4 s at sf0.1); the LCG is pure integer codegen (~1 s).
_BOOT_U = (
    f"((((o_orderkey * {BOOT_B} + b) * 1103515245 + 12345) % {_LCG_M})"
    f" * 1103515245 + 12345) % {_LCG_M}"
)


def _pois_k_sql(u: str) -> str:
    """Poisson(1) draw as a CASE ladder over the LCG uniform."""
    clauses = " ".join(
        f"WHEN ({u}) < {t} THEN {k}" for k, t in enumerate(POIS_THRESH)
    )
    return f"CASE {clauses} ELSE {len(POIS_THRESH)} END"


@register(
    "poisson_bootstrap_ci_revenue",
    oracle=f"""
    WITH rows_w AS (
      SELECT b, {_pois_k_sql(_BOOT_U)} AS k,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders
      CROSS JOIN (SELECT unnest(range(1, {BOOT_B} + 1)) AS b)
    ),
    reps AS (
      SELECT b,
             CAST(SUM(k * cents) AS BIGINT) AS wsum,
             CAST(SUM(k) AS BIGINT) AS wn
      FROM rows_w GROUP BY b
    ),
    means AS (
      SELECT b, CAST(wsum AS DOUBLE) / CAST(wn AS DOUBLE) / 100.0 AS m
      FROM reps WHERE wn > 0
    ),
    point AS (
      SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                  AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) / 100.0 AS point_mean
      FROM orders
    )
    SELECT CAST({BOOT_B} AS BIGINT) AS n_replicates,
           ROUND(point_mean, 6) AS point_mean,
           ROUND(QUANTILE_CONT(m, 0.05), 6) AS ci_lo,
           ROUND(QUANTILE_CONT(m, 0.95), 6) AS ci_hi,
           QUANTILE_CONT(m, 0.05) <= point_mean
             AND point_mean <= QUANTILE_CONT(m, 0.95) AS point_in_ci
    FROM means CROSS JOIN point
    GROUP BY point_mean
    """,
    survey="extension (statistics): Poisson bootstrap confidence interval "
    "for mean order value — the distributed bootstrap: per (row, "
    "replicate) weight k ~ Poisson(1) drawn DETERMINISTICALLY from a "
    "two-step integer LCG uniform via an inverse-CDF ladder (pure "
    "codegen arithmetic — no per-row hashing), so replicates "
    "are reproducible across engines/layouts and no resampled copy of "
    "the data ever materializes (one scan, B weighted partial sums). "
    "Replicate means are exact-integer ratios; the 5/95 CI is exact "
    "QUANTILE_CONT over the B means. No reference analog",
)
def poisson_bootstrap_ci_revenue(spark, sf_dir) -> DataFrame:
    """90% bootstrap CI for the mean order price, B=32 replicates.

    Scale shape: the replicate fan-out is map-side (explode of 32 ints);
    everything reduces through ONE map-side-combining groupBy(b) into 32
    rows — the classic one-pass Poisson bootstrap (each row's weight in
    replicate b is an independent-ish Poisson(1), giving the same
    asymptotics as multinomial resampling without coordination)."""
    orders = t(spark, sf_dir, "orders")
    rows_w = orders.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        F.explode(F.sequence(F.lit(1), F.lit(BOOT_B))).alias("b"),
        "o_orderkey",
    )
    x = F.col("o_orderkey") * F.lit(BOOT_B) + F.col("b")
    h1 = (x * F.lit(1103515245) + F.lit(12345)) % F.lit(_LCG_M)
    u = (h1 * F.lit(1103515245) + F.lit(12345)) % F.lit(_LCG_M)
    k = F.lit(len(POIS_THRESH))
    for kk in range(len(POIS_THRESH) - 1, -1, -1):
        k = F.when(u < POIS_THRESH[kk], F.lit(kk)).otherwise(k)
    reps = (
        rows_w.select("b", (k * F.col("cents")).alias("wc"), k.alias("k"))
        .groupBy("b")
        .agg(
            F.sum("wc").cast("long").alias("wsum"),
            F.sum("k").cast("long").alias("wn"),
        )
        .filter(F.col("wn") > 0)
        .select(
            (
                F.col("wsum").cast("double")
                / F.col("wn").cast("double")
                / F.lit(100.0)
            ).alias("m")
        )
    )
    point = orders.agg(
        (
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(100.0)
        ).alias("point_mean")
    )
    ci = reps.agg(
        F.percentile(F.col("m"), F.lit(0.05)).alias("lo"),
        F.percentile(F.col("m"), F.lit(0.95)).alias("hi"),
    )
    return ci.crossJoin(F.broadcast(point)).select(
        F.lit(BOOT_B).cast("long").alias("n_replicates"),
        F.round("point_mean", 6).alias("point_mean"),
        F.round("lo", 6).alias("ci_lo"),
        F.round("hi", 6).alias("ci_hi"),
        (
            (F.col("lo") <= F.col("point_mean"))
            & (F.col("point_mean") <= F.col("hi"))
        ).alias("point_in_ci"),
    )


# ------------------------------------------------------- RFM segmentation


@register(
    "customer_rfm_segments",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             DATE_DIFF('day', MAX(o_orderdate),
                       (SELECT MAX(o_orderdate) FROM orders)) AS r_days,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                 AS cents
      FROM orders GROUP BY o_custkey
    ),
    cuts AS (
      SELECT QUANTILE_CONT(CAST(r_days AS DOUBLE), 0.25) AS r25,
             QUANTILE_CONT(CAST(r_days AS DOUBLE), 0.50) AS r50,
             QUANTILE_CONT(CAST(r_days AS DOUBLE), 0.75) AS r75,
             QUANTILE_CONT(CAST(freq AS DOUBLE), 0.25) AS f25,
             QUANTILE_CONT(CAST(freq AS DOUBLE), 0.50) AS f50,
             QUANTILE_CONT(CAST(freq AS DOUBLE), 0.75) AS f75,
             QUANTILE_CONT(CAST(cents AS DOUBLE), 0.25) AS m25,
             QUANTILE_CONT(CAST(cents AS DOUBLE), 0.50) AS m50,
             QUANTILE_CONT(CAST(cents AS DOUBLE), 0.75) AS m75
      FROM rfm
    ),
    scored AS (
      SELECT CAST(1 + (CAST(r_days AS DOUBLE) <= r75)::INT
                    + (CAST(r_days AS DOUBLE) <= r50)::INT
                    + (CAST(r_days AS DOUBLE) <= r25)::INT AS BIGINT)
                 AS r_score,
             CAST(1 + (CAST(freq AS DOUBLE) >= f25)::INT
                    + (CAST(freq AS DOUBLE) >= f50)::INT
                    + (CAST(freq AS DOUBLE) >= f75)::INT AS BIGINT)
                 AS f_score,
             CAST(1 + (CAST(cents AS DOUBLE) >= m25)::INT
                    + (CAST(cents AS DOUBLE) >= m50)::INT
                    + (CAST(cents AS DOUBLE) >= m75)::INT AS BIGINT)
                 AS m_score,
             cents
      FROM rfm CROSS JOIN cuts
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS segment_cents
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
    survey="extension (product analytics): RFM segmentation — per-"
    "customer recency/frequency/monetary rollup, quartile CUTPOINTS "
    "from exact percentiles, scores assigned by map-side comparison "
    "against the broadcast 9-value cutpoint row (NOT a global ntile "
    "sort: at 100 TB the cutpoint approach is one aggregate + one "
    "map pass, where ntile is a total sort). Integer cents; verdict-"
    "free exact output. No reference analog",
)
def customer_rfm_segments(spark, sf_dir) -> DataFrame:
    """RFM segment census: (r, f, m) quartile scores 1-4 per customer,
    aggregated to segment counts and monetary totals.

    Deterministic without ordering: scores come from comparisons against
    exact-percentile cutpoints, so ties land identically in both engines
    and under any partitioning."""
    orders = t(spark, sf_dir, "orders")
    maxd = orders.agg(F.max("o_orderdate").alias("maxd"))
    rfm = (
        orders.crossJoin(F.broadcast(maxd))
        .groupBy("o_custkey")
        .agg(
            # min over (maxd - orderdate) == days since the LAST order
            F.min(F.datediff(F.col("maxd"), F.col("o_orderdate")))
            .alias("r_days"),
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        # Materialized ONCE (round-12 verdict item 5, guide §2.4): the
        # rollup is referenced by BOTH the cutpoint aggregate and the
        # scoring pass, so the un-checkpointed plan scanned + aggregated
        # orders twice per run.  State is per-customer (4 numeric cols)
        # — orders-to-customers-scale reduction, the same
        # decide-on-a-proxy shape as the round-12 materializations.
        .localCheckpoint(eager=True)
    )
    cuts = rfm.agg(
        *[
            F.percentile(F.col(c).cast("double"), F.lit(p)).alias(f"{c[0]}{int(p * 100)}")
            for c in ("r_days", "freq", "cents")
            for p in (0.25, 0.50, 0.75)
        ]
    )
    # cents quantiles got aliased c25/c50/c75; rename to the oracle's m*
    cuts = (
        cuts.withColumnRenamed("c25", "m25")
        .withColumnRenamed("c50", "m50")
        .withColumnRenamed("c75", "m75")
    )
    b = lambda cond: cond.cast("int")  # noqa: E731
    scored = rfm.crossJoin(F.broadcast(cuts)).select(
        (
            F.lit(1)
            + b(F.col("r_days").cast("double") <= F.col("r75"))
            + b(F.col("r_days").cast("double") <= F.col("r50"))
            + b(F.col("r_days").cast("double") <= F.col("r25"))
        )
        .cast("long")
        .alias("r_score"),
        (
            F.lit(1)
            + b(F.col("freq").cast("double") >= F.col("f25"))
            + b(F.col("freq").cast("double") >= F.col("f50"))
            + b(F.col("freq").cast("double") >= F.col("f75"))
        )
        .cast("long")
        .alias("f_score"),
        (
            F.lit(1)
            + b(F.col("cents").cast("double") >= F.col("m25"))
            + b(F.col("cents").cast("double") >= F.col("m50"))
            + b(F.col("cents").cast("double") >= F.col("m75"))
        )
        .cast("long")
        .alias("m_score"),
        "cents",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("segment_cents"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# ------------------------------------------------------ ABC classification


@register(
    "abc_classification_parts",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand, l.l_partkey,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount)
                                 * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand, l.l_partkey
    ),
    ranked AS (
      SELECT p_brand, l_partkey, cents,
             CAST(SUM(cents) OVER (PARTITION BY p_brand
                                   ORDER BY cents DESC, l_partkey
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS run_cents,
             CAST(SUM(cents) OVER (PARTITION BY p_brand) AS BIGINT)
                 AS brand_cents
      FROM rev
    ),
    classed AS (
      SELECT p_brand, l_partkey, cents,
             CASE WHEN run_cents * 10 <= brand_cents * 8 THEN 'A'
                  WHEN run_cents * 20 <= brand_cents * 19 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked
    )
    SELECT p_brand, abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS class_cents
    FROM classed
    GROUP BY p_brand, abc_class
    ORDER BY p_brand, abc_class
    """,
    survey="extension (OLAP): ABC (80/95 cumulative-share) inventory "
    "classification — per-brand part revenue ranked by a PARTITIONED "
    "running-sum window, class cut by exact integer cross-"
    "multiplication (run*10 <= total*8), censused per class. The "
    "Pareto-principle slicing every supply-chain mart ships; windows "
    "stay per-brand so no global sort exists at any scale",
)
def abc_classification_parts(spark, sf_dir) -> DataFrame:
    """Per-brand ABC census: class A = parts inside the first 80% of
    cumulative revenue, B to 95%, C the tail. Integer cross-multiplied
    thresholds — no float shares anywhere."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "l_partkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice")
                    * (F.lit(1.0) - F.col("l_discount"))
                    * 100,
                    0,
                ).cast("long")
            )
            .cast("long")
            .alias("cents")
        )
    )
    run_w = (
        Window.partitionBy("p_brand")
        .orderBy(F.col("cents").desc(), "l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy("p_brand")
    ranked = rev.select(
        "p_brand",
        "l_partkey",
        "cents",
        F.sum("cents").over(run_w).cast("long").alias("run_cents"),
        F.sum("cents").over(tot_w).cast("long").alias("brand_cents"),
    )
    abc = (
        F.when(F.col("run_cents") * 10 <= F.col("brand_cents") * 8, "A")
        .when(F.col("run_cents") * 20 <= F.col("brand_cents") * 19, "B")
        .otherwise("C")
    )
    return (
        ranked.select("p_brand", "cents", abc.alias("abc_class"))
        .groupBy("p_brand", "abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("cents").cast("long").alias("class_cents"),
        )
        .orderBy("p_brand", "abc_class")
    )


# ----------------------------------------------- sampled estimate (AQP)

#: Deterministic sample rate in permille for the AQP estimate. 200 (20%)
#: keeps the within-10%% verdict >= 3 sigma from flipping even at the
#: smallest test SF (~1.5k orders -> ~300 sampled, rel. err ~3%%); a 5%%
#: rate was ~1.7 sigma there — a flaky hard gate.
AQP_PERMILLE = 200


@register(
    "sampled_revenue_estimate",
    oracle=f"""
    WITH tagged AS (
      SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
             ('0x' || SUBSTR(MD5(CAST(o_orderkey AS VARCHAR)), 1, 12))::BIGINT
                 % 1000 < {AQP_PERMILLE} AS in_sample
      FROM orders
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(SUM(cents) AS BIGINT) AS exact_cents,
             CAST(COUNT(CASE WHEN in_sample THEN 1 END) AS BIGINT)
                 AS n_sampled,
             CAST(SUM(CASE WHEN in_sample THEN cents END) AS BIGINT)
                 AS sample_cents
      FROM tagged
    )
    SELECT n_total, n_sampled, exact_cents,
           CAST(sample_cents * 1000 // {AQP_PERMILLE} AS BIGINT)
               AS estimated_cents,
           ABS(CAST(sample_cents * 1000 // {AQP_PERMILLE} AS DOUBLE)
               - CAST(exact_cents AS DOUBLE))
             <= CAST(exact_cents AS DOUBLE) * 0.10 AS within_10pct
    FROM agg
    """,
    survey="extension (approximate query processing): sampled SUM "
    "estimate — a deterministic 20% hash sample scaled by the inverse "
    "rate, with the exact total computed alongside and the relative "
    "error pinned within 10% as a hard verdict. The AQP trade every "
    "interactive 100 TB dashboard makes: the sampled scan reads a fixed "
    "fraction of "
    "the data for a statistically-controlled estimate; hash selection "
    "keeps the sample identical across engines, layouts, and reruns",
)
def sampled_revenue_estimate(spark, sf_dir) -> DataFrame:
    """Total-revenue estimate from a 20% deterministic sample vs the exact
    total, with a within-10% verdict. In production the exact branch is
    absent — it exists here as the oracle's measuring stick."""
    orders = t(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 12), 16, 10
    ).cast("long")
    tagged = orders.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        ((h % 1000) < AQP_PERMILLE).alias("in_sample"),
    )
    agg = tagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum("cents").cast("long").alias("exact_cents"),
        F.count(F.when(F.col("in_sample"), 1)).cast("long").alias("n_sampled"),
        F.sum(F.when(F.col("in_sample"), F.col("cents")))
        .cast("long")
        .alias("sample_cents"),
    )
    est = F.expr(f"CAST(sample_cents * 1000 div {AQP_PERMILLE} AS BIGINT)")
    return agg.select(
        "n_total",
        "n_sampled",
        "exact_cents",
        est.alias("estimated_cents"),
        (
            F.abs(est.cast("double") - F.col("exact_cents").cast("double"))
            <= F.col("exact_cents").cast("double") * F.lit(0.10)
        ).alias("within_10pct"),
    )
