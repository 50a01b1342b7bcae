"""Embedding similarity queries over ``embeddings`` (extension surface).

Oracle note: Spark computes dot products as an explicit fold
(operators/similarity.py); DuckDB uses list_dot_product. Both in double
precision — results are rounded to 6 decimals before any ranking so the
~1e-15 summation-order drift can never flip an output or a rank (ranking
ties on the rounded value break by cand_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from energy_emissions_lakehouse_spark.functions.exact import scaled_sum, scaled_sum_sql
from energy_emissions_lakehouse_spark.operators import similarity as sim
from energy_emissions_lakehouse_spark.registry import register
from energy_emissions_lakehouse_spark.tables import t

def _pq_staged_model(
    spark, sf_dir: str, m: int, ksub: int, iters: int, fresh: bool = False
):
    """Train-once-serve-many: the PQ model (encoded corpus + codebooks) is
    an INDEX — production builds it once per corpus version and serves
    every query against it. Stage both tables as parquet keyed by the
    embeddings file's (mtime, size) + geometry, so a regenerated corpus
    retrains automatically and the timed query path measures ADC serving,
    not Lloyd training. Staging mechanics (atomic rename, 0700 per-user
    root, _SUCCESS marker — round-3 advice) live in fsutil.staged_tables."""
    from energy_emissions_lakehouse_spark.fsutil import (
        staged_tables,
        table_cache_key,
    )

    model: dict = {}

    def _train() -> None:
        emb = t(spark, sf_dir, "embeddings").select(
            "vec_id", sim.as_double(F.col("embedding")).alias("v")
        )
        encoded, codebooks = sim.pq_model(emb, m=m, ksub=ksub, iters=iters)
        model["encoded"], model["codebooks"] = encoded, codebooks.coalesce(1)

    def _built(name: str):
        def build():
            if not model:
                _train()  # one Lloyd run feeds both staged tables
            return model[name]

        return build

    staged = staged_tables(
        spark,
        "pq",
        table_cache_key(sf_dir, "embeddings", "pq", m, ksub, iters),
        {"encoded": _built("encoded"), "codebooks": _built("codebooks")},
        fresh=fresh,
    )
    return staged["encoded"], staged["codebooks"]


_DOT = "list_dot_product({a}, {b})"
_NORM = "sqrt(list_dot_product({v}, {v}))"
_EMB = "CAST(embedding AS DOUBLE[])"

_COS = (
    "ROUND(list_dot_product(q.v, c.v) / NULLIF("
    "sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)), 0.0), 6)"
)

def _plane_sql(i: int) -> str:
    return "[" + ", ".join(f"{float(w)}" for w in sim.hyperplane(i)) + "]::DOUBLE[]"


def _bucket_sql(num_hyperplanes: int) -> str:
    return " + ".join(
        "(CASE WHEN list_dot_product(v, {plane}) >= 0.0 THEN {bit} ELSE 0 END)".format(
            plane=_plane_sql(i), bit=1 << i
        )
        for i in range(num_hyperplanes)
    )


_BUCKET_SQL = _bucket_sql(sim.NUM_HYPERPLANES)


@register(
    "embedding_norm_stats",
    oracle=f"""
    SELECT CAST(label AS BIGINT) AS label,
           COUNT(*) AS n_vectors,
           ROUND({scaled_sum_sql(_NORM.format(v=_EMB), 1_000_000)}
                 / CAST(COUNT(*) AS DOUBLE), 6) AS avg_norm
    FROM embeddings
    GROUP BY CAST(label AS BIGINT)
    """,
    survey="extension (similarity): vector-norm profile per label — "
    "array<float> columns handled fully JVM-side (zip_with/aggregate)",
)
def embedding_norm_stats(spark, sf_dir) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    v = sim.as_double(F.col("embedding"))
    n = F.count(F.lit(1))
    return emb.groupBy(F.col("label").cast("long").alias("label")).agg(
        n.alias("n_vectors"),
        F.round(
            scaled_sum(sim.norm(v), scale=1_000_000) / n.cast("double"), 6
        ).alias("avg_norm"),
    )


@register(
    "cosine_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, {_EMB} AS v FROM embeddings
               WHERE vec_id % 100 = 0),
    c AS (SELECT vec_id AS cand_id, {_EMB} AS v FROM embeddings),
    scored AS (
        SELECT q.query_id, c.cand_id, {_COS} AS sim
        FROM q CROSS JOIN c WHERE q.query_id != c.cand_id
    )
    SELECT * FROM (
        SELECT query_id, cand_id, sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, cand_id) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
    survey="extension (similarity): exact cosine top-k baseline — broadcast "
    "query set x full scan, the brute-force ANN reference",
)
def cosine_topk_bruteforce(spark, sf_dir) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return sim.brute_force_topk(queries, emb, k=10)


@register(
    "ann_bucket_histogram",
    oracle=f"""
    WITH a AS (SELECT vec_id, ({_BUCKET_SQL}) AS bucket
               FROM (SELECT vec_id, {_EMB} AS v FROM embeddings))
    SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_vectors
    FROM a GROUP BY bucket
    """,
    survey="extension (similarity, scale path): hyperplane-LSH bucket "
    "assignment histogram — map-only pass, deterministic planes",
)
def ann_bucket_histogram(spark, sf_dir) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    v = sim.as_double(F.col("embedding"))
    return (
        emb.select(sim.lsh_bucket(v).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


@register(
    "embedding_cosine_neardup",
    oracle=f"""
    WITH base AS (SELECT vec_id, {_EMB} AS v FROM embeddings),
    aug AS (
        SELECT vec_id, v FROM base
        UNION ALL  -- identical copies: sim 1.0
        SELECT vec_id + 100000, v FROM base WHERE vec_id % 25 = 0
        UNION ALL  -- scaled copies: sim still 1.0 (norm-invariance check)
        SELECT vec_id + 200000, list_transform(v, x -> x * 2.0)
        FROM base WHERE vec_id % 50 = 0
        UNION ALL  -- negated copies: sim -1.0, must be filtered out
        SELECT vec_id + 300000, list_transform(v, x -> -x)
        FROM base WHERE vec_id % 100 = 0
    ),
    a AS (SELECT vec_id, v, ({_BUCKET_SQL}) AS bucket FROM aug)
    SELECT x.vec_id AS a_id, y.vec_id AS b_id, {_COS.replace('q.', 'x.').replace('c.', 'y.')} AS sim
    FROM a x JOIN a y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    WHERE {_COS.replace('q.', 'x.').replace('c.', 'y.')} >= 0.9
    """,
    survey="extension (dedup, embedding tier): cosine near-duplicate pairs "
    "via hyperplane-LSH bucket equi-join; duplicate copies (identical, "
    "scaled, negated) injected deterministically since testdata has none",
)
def embedding_cosine_neardup(spark, sf_dir) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double(F.col("embedding")).alias("embedding")
    )
    scaled = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 200000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
    )
    negated = emb.filter(F.col("vec_id") % 100 == 0).select(
        (F.col("vec_id") + 300000).alias("vec_id"),
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    copies = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    aug = emb.unionByName(copies).unionByName(scaled).unionByName(negated)
    return sim.cosine_neardup_pairs(aug, threshold=0.9)


_ADAPTIVE_MAXH = 16
_ADAPTIVE_OCC = 64
_ADAPTIVE_BUCKET_SQL = " + ".join(
    "(CASE WHEN {i} < nh.h AND list_dot_product(v, {plane}) >= 0.0 "
    "THEN {bit} ELSE 0 END)".format(i=i, plane=_plane_sql(i), bit=1 << i)
    for i in range(_ADAPTIVE_MAXH)
)


@register(
    "embedding_neardup_adaptive",
    oracle=f"""
    WITH nh AS (
        SELECT MIN(g) AS h
        FROM generate_series(1, {_ADAPTIVE_MAXH}) t(g),
             (SELECT COUNT(*) AS n FROM embeddings) c
        WHERE {_ADAPTIVE_OCC} * (CAST(1 AS BIGINT) << g) >= c.n
    ),
    base AS (SELECT vec_id, {_EMB} AS v FROM embeddings),
    aug AS (
        SELECT vec_id, v FROM base
        UNION ALL
        SELECT vec_id + 100000, v FROM base WHERE vec_id % 25 = 0
    ),
    a AS (SELECT vec_id, v, ({_ADAPTIVE_BUCKET_SQL}) AS bucket
          FROM aug CROSS JOIN nh)
    SELECT x.vec_id AS a_id, y.vec_id AS b_id,
           {_COS.replace('q.', 'x.').replace('c.', 'y.')} AS sim
    FROM a x JOIN a y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    WHERE {_COS.replace('q.', 'x.').replace('c.', 'y.')} >= 0.9
    """,
    survey="extension (dedup, embedding tier, scale path): near-duplicate "
    "pairs with LSH geometry SIZED BY THE CORPUS — H = smallest h with "
    "occ*2^h >= N (integer ladder, cross-engine exact; occ=64), so bucket "
    "occupancy and per-bucket quadratic work stay ~constant as N grows. "
    "H=3 at N=500, H=5 at N=2000 here; replaces the fixed 2^8-bucket "
    "geometry flagged in round 1 (operators/similarity.py "
    "num_hyperplanes_for)",
)
def embedding_neardup_adaptive(spark, sf_dir) -> DataFrame:
    """Corpus-adaptive hyperplane count: the count() is index-build
    metadata (one scalar to the driver at plan time, standard for sizing
    an index), then the same bucket equi-join as cosine_neardup_pairs."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double(F.col("embedding")).alias("embedding")
    )
    h = sim.num_hyperplanes_for(emb.count(), target_occupancy=_ADAPTIVE_OCC)
    copies = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    aug = emb.unionByName(copies)
    return sim.cosine_neardup_pairs(aug, threshold=0.9, num_hyperplanes=h)


@register(
    "ann_bucketed_topk",
    oracle=f"""
    WITH a AS (SELECT vec_id, v, ({_BUCKET_SQL}) AS bucket
               FROM (SELECT vec_id, {_EMB} AS v FROM embeddings)),
    q AS (SELECT vec_id AS query_id, v, bucket FROM a WHERE vec_id % 100 = 0),
    c AS (SELECT vec_id AS cand_id, v, bucket FROM a),
    scored AS (
        SELECT q.query_id, c.cand_id, {_COS} AS sim
        FROM q JOIN c ON q.bucket = c.bucket AND q.query_id != c.cand_id
    )
    SELECT * FROM (
        SELECT query_id, cand_id, sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, cand_id) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= 3
    """,
    survey="extension (similarity, scale path): top-k within LSH bucket — "
    "equi-join on bucket id replaces the full scan per query",
)
def ann_bucketed_topk(spark, sf_dir) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return sim.bucketed_topk(queries, emb, k=3)


_MARGIN_SQL_UNION = "\n        UNION ALL ".join(
    f"SELECT vec_id, {i} AS i, "
    f"ROUND(ABS(list_dot_product(v, {_plane_sql(i)})), 6) AS am "
    f"FROM base WHERE vec_id % 100 = 0"
    for i in range(5)
)


@register(
    "ann_multiprobe_topk",
    oracle=f"""
    WITH base AS (SELECT vec_id, {_EMB} AS v FROM embeddings),
    a AS (SELECT vec_id, v, ({_bucket_sql(5)}) AS bucket FROM base),
    qm AS (
        {_MARGIN_SQL_UNION}
    ),
    ranked AS (
        SELECT vec_id, i,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY am, i) AS rn
        FROM qm
    ),
    flips AS (
        SELECT vec_id,
               MAX(CASE WHEN rn = 1 THEN (1::BIGINT << i) END) AS b1,
               MAX(CASE WHEN rn = 2 THEN (1::BIGINT << i) END) AS b2,
               MAX(CASE WHEN rn = 3 THEN (1::BIGINT << i) END) AS b3,
               MAX(CASE WHEN rn = 4 THEN (1::BIGINT << i) END) AS b4
        FROM ranked GROUP BY vec_id
    ),
    pb AS (SELECT a.vec_id, a.v, a.bucket, f.b1, f.b2, f.b3, f.b4
           FROM a JOIN flips f USING (vec_id)),
    probes AS (
        SELECT vec_id, v, CAST(bucket AS BIGINT) AS probe FROM pb
        UNION ALL SELECT vec_id, v, xor(CAST(bucket AS BIGINT), b1) FROM pb
        UNION ALL SELECT vec_id, v, xor(CAST(bucket AS BIGINT), b2) FROM pb
        UNION ALL SELECT vec_id, v, xor(CAST(bucket AS BIGINT), b3) FROM pb
        UNION ALL SELECT vec_id, v, xor(CAST(bucket AS BIGINT), b4) FROM pb
        UNION ALL SELECT vec_id, v, xor(CAST(bucket AS BIGINT), xor(b1, b2)) FROM pb
        UNION ALL SELECT vec_id, v, xor(CAST(bucket AS BIGINT), xor(b1, b3)) FROM pb
        UNION ALL SELECT vec_id, v, xor(CAST(bucket AS BIGINT), xor(b2, b3)) FROM pb
    ),
    scored AS (
        SELECT p.vec_id AS query_id, c.vec_id AS cand_id,
               ROUND(list_dot_product(p.v, c.v) / NULLIF(
                   sqrt(list_dot_product(p.v, p.v))
                   * sqrt(list_dot_product(c.v, c.v)), 0.0), 6) AS sim
        FROM probes p
        JOIN a c ON p.probe = CAST(c.bucket AS BIGINT)
                AND p.vec_id != c.vec_id
    )
    SELECT * FROM (
        SELECT query_id, cand_id, sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, cand_id) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= 3
    """,
    survey="extension (similarity, scale path): MULTI-PROBE hyperplane-LSH "
    "top-k — home bucket + single flips of the 4 lowest-|margin| planes + "
    "pair flips of the 3 lowest (8 probes of 2^5 buckets). Fixes round 1's "
    "recall@3=0.10 single-probe (now 0.58-0.60 measured) at ~1/3-corpus "
    "scoring cost; fan-out multiplies only the small query side. H sized "
    "by num_hyperplanes_for(corpus) in production (operators/similarity.py)",
)
def ann_multiprobe_topk(spark, sf_dir) -> DataFrame:
    """Margin-guided multi-probe LSH search, the production replacement
    for ann_bucketed_topk's single probe."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return sim.multiprobe_topk(queries, emb, k=3, num_hyperplanes=5)


@register(
    "ivf_topk_nprobe1",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_EMB} AS v FROM embeddings),
    cent AS (SELECT vec_id AS centroid_id, v AS c_vec FROM e
             WHERE vec_id % 100 = 1),
    scored AS (
        SELECT e.vec_id, e.v, cent.centroid_id,
               ROUND(list_dot_product(e.v, cent.c_vec) / NULLIF(
                   sqrt(list_dot_product(e.v, e.v))
                   * sqrt(list_dot_product(cent.c_vec, cent.c_vec)), 0.0), 6)
                   AS c_sim
        FROM e CROSS JOIN cent
    ),
    assigned AS (
        SELECT vec_id, v, centroid_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                       ORDER BY c_sim DESC, centroid_id) AS rn
            FROM scored
        ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, v, centroid_id FROM assigned
          WHERE vec_id % 100 = 0),
    c AS (SELECT vec_id AS cand_id, v, centroid_id FROM assigned),
    pairs AS (
        SELECT q.query_id, c.cand_id, {_COS} AS sim
        FROM q JOIN c ON q.centroid_id = c.centroid_id
                     AND q.query_id != c.cand_id
    )
    SELECT * FROM (
        SELECT query_id, cand_id, sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, cand_id) AS BIGINT) AS rank
        FROM pairs
    ) WHERE rank <= 3
    """,
    survey="extension (similarity, IVF tier): inverted-file ANN — broadcast "
    "coarse quantization to deterministic centroids, then nprobe=1 search "
    "within the cell (equi-join on centroid_id); the second scale path "
    "besides hyperplane LSH",
)
def ivf_topk_nprobe1(spark, sf_dir) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double(F.col("embedding")).alias("v")
    )
    centroids = emb.filter(F.col("vec_id") % 100 == 1)
    return sim.ivf_topk(
        emb, centroids, F.col("vec_id") % 100 == 0, k=3
    )


def _kmeans_oracle_sql(k: int = 8, iters: int = 3) -> str:
    """DuckDB replay of kmeans_lloyd: seed = k lowest ids, then ``iters``
    unrolled (update centroids -> re-assign) rounds. Exact cross-engine
    parity holds because the model state is quantized: both engines round
    each centroid mean to 9 dp per iteration, so FP summation-order drift
    (~1e-15) can never compound into a divergent assignment."""
    d2 = (
        "list_sum(list_transform(list_zip(e.v, s.c_vec), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )

    def assign(cents: str, name: str) -> str:
        return f"""{name} AS (
        SELECT vec_id, v, cluster_id, d2 FROM (
            SELECT vec_id, v, cluster_id, d2,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                       ORDER BY d2, cluster_id) AS rn
            FROM (SELECT e.vec_id, e.v, s.cluster_id, {d2} AS d2
                  FROM e CROSS JOIN {cents} s)
        ) WHERE rn = 1)"""

    def update(assigned: str, name: str) -> str:
        return f"""{name} AS (
        SELECT cluster_id, list(m ORDER BY pos) AS c_vec FROM (
            SELECT cluster_id, pos, ROUND(AVG(val), 9) AS m FROM (
                SELECT cluster_id, generate_subscripts(v, 1) AS pos,
                       unnest(v) AS val FROM {assigned})
            GROUP BY cluster_id, pos)
        GROUP BY cluster_id)"""

    ctes = [
        f"e AS (SELECT vec_id, {_EMB} AS v FROM embeddings)",
        "seed AS (SELECT vec_id AS cluster_id, v AS c_vec FROM e "
        f"ORDER BY vec_id LIMIT {k})",
        assign("seed", "a0"),
    ]
    cur = "a0"
    for i in range(1, iters + 1):
        ctes.append(update(cur, f"c{i}"))
        ctes.append(assign(f"c{i}", f"a{i}"))
        cur = f"a{i}"
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT cluster_id, COUNT(*) AS n_members,
           ROUND(SUM(d2), 6) AS inertia
    FROM {cur} GROUP BY cluster_id"""
    )


@register(
    "embedding_kmeans_clusters",
    oracle=_kmeans_oracle_sql(k=8, iters=3),
    survey="extension (similarity, iterative): distributed Lloyd k-means "
    "— deterministic seed (k lowest ids), per-iteration broadcast-assign "
    "(map-only) + posexplode hash-aggregate update; model state is k x d, "
    "quantized to 9 dp per iteration (cross-engine bit-reproducible) and "
    "localCheckpoint'd, the data never collects. The IVF centroid "
    "TRAINING step that ivf_topk_nprobe1 consumes; the DuckDB oracle "
    "replays all 3 Lloyd iterations exactly (value-hash parity), and "
    "tests additionally assert inertia is monotone non-increasing",
)
def embedding_kmeans_clusters(spark, sf_dir) -> DataFrame:
    """8-way k-means over the embedding corpus, 3 Lloyd iterations.
    Returns (cluster_id, n_members, inertia) — the training half of the
    IVF index pipeline."""
    # round-6 loop audit: the final assign + k-row census would otherwise
    # execute at the caller session's partition count when the driver
    # collects; materialize inside the same override the trainer uses.
    # The lazy plan lives in _kmeans_frame so the window-free argmin pin
    # stays inspectable (the checkpoint opaques the returned frame).
    from energy_emissions_lakehouse_spark.session import (
        loop_shuffle_partitions,
    )

    with loop_shuffle_partitions(spark, 8):
        return _kmeans_frame(spark, sf_dir).localCheckpoint(eager=True)


def _kmeans_frame(spark, sf_dir) -> DataFrame:
    """Lazy Lloyd plan for ``embedding_kmeans_clusters`` (see the
    execution wrapper there)."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double(F.col("embedding")).alias("v")
    )
    return sim.kmeans_lloyd(emb, k=8, iters=3)


@register(
    "ivf_topk_nprobe2",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_EMB} AS v FROM embeddings),
    cent AS (SELECT vec_id AS centroid_id, v AS c_vec FROM e
             WHERE vec_id % 100 = 1),
    scored AS (
        SELECT e.vec_id, e.v, cent.centroid_id,
               ROUND(list_dot_product(e.v, cent.c_vec) / NULLIF(
                   sqrt(list_dot_product(e.v, e.v))
                   * sqrt(list_dot_product(cent.c_vec, cent.c_vec)), 0.0), 6)
                   AS c_sim,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY ROUND(list_dot_product(e.v, cent.c_vec) / NULLIF(
                       sqrt(list_dot_product(e.v, e.v))
                       * sqrt(list_dot_product(cent.c_vec, cent.c_vec)),
                       0.0), 6) DESC, cent.centroid_id) AS rn
        FROM e CROSS JOIN cent
    ),
    home AS (SELECT vec_id AS cand_id, v, centroid_id FROM scored
             WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, v, centroid_id FROM scored
          WHERE vec_id % 100 = 0 AND rn <= 2),
    pairs AS (
        SELECT q.query_id, home.cand_id, {_COS.replace('c.v', 'home.v')} AS sim
        FROM q JOIN home ON q.centroid_id = home.centroid_id
                        AND q.query_id != home.cand_id
    )
    SELECT * FROM (
        SELECT query_id, cand_id, sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, cand_id) AS BIGINT) AS rank
        FROM pairs
    ) WHERE rank <= 3
    """,
    survey="extension (similarity, IVF tier): nprobe=2 inverted-file ANN "
    "— each query probes its TWO nearest cells (bounded x2 fan-out on the "
    "small query side only; candidates stay in their home cell), lifting "
    "recall toward brute force at O(nprobe x N/nlist) cost. Same "
    "equi-join-on-cell scale shape as nprobe=1",
)
def ivf_topk_nprobe2(spark, sf_dir) -> DataFrame:
    """IVF top-3 with nprobe=2 over deterministic centroids — the
    recall/cost dial of the IVF index demonstrated as a first-class
    operator."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double(F.col("embedding")).alias("v")
    )
    centroids = emb.filter(F.col("vec_id") % 100 == 1)
    return sim.ivf_topk_nprobe(
        emb, centroids, F.col("vec_id") % 100 == 0, k=3, nprobe=2
    )


def _pq_ctes(m: int, ksub: int, iters: int) -> tuple[list, str, list]:
    """Shared CTE builder for the PQ oracles: per subspace, seed = ksub
    lowest ids' slices, then ``iters`` unrolled Lloyd rounds (same
    9-dp-quantized model state as the k-means oracle). Slices are 1-based
    inclusive (DuckDB list slicing); Spark's F.slice(v, start, length)
    addresses the same elements.

    Returns (ctes, enc_union_select, final_centroid_cte_names)."""
    d2 = (
        "list_sum(list_transform(list_zip(e.v, s.c_vec), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    dim = sim.EMBED_DIM // m

    def assign(cents: str, name: str, e: str) -> str:
        return f"""{name} AS (
        SELECT vec_id, v, cluster_id, d2 FROM (
            SELECT vec_id, v, cluster_id, d2,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                       ORDER BY d2, cluster_id) AS rn
            FROM (SELECT e.vec_id, e.v, s.cluster_id, {d2} AS d2
                  FROM {e} e CROSS JOIN {cents} s)
        ) WHERE rn = 1)"""

    def update(assigned: str, name: str) -> str:
        return f"""{name} AS (
        SELECT cluster_id, list(m ORDER BY pos) AS c_vec FROM (
            SELECT cluster_id, pos, ROUND(AVG(val), 9) AS m FROM (
                SELECT cluster_id, generate_subscripts(v, 1) AS pos,
                       unnest(v) AS val FROM {assigned})
            GROUP BY cluster_id, pos)
        GROUP BY cluster_id)"""

    ctes, finals, cent_names = [], [], []
    for s in range(m):
        lo, hi = s * dim + 1, (s + 1) * dim
        ctes.append(
            f"e{s} AS (SELECT vec_id, ({_EMB})[{lo}:{hi}] AS v FROM embeddings)"
        )
        ctes.append(
            f"seed{s} AS (SELECT vec_id AS cluster_id, v AS c_vec FROM e{s} "
            f"ORDER BY vec_id LIMIT {ksub})"
        )
        ctes.append(assign(f"seed{s}", f"s{s}a0", f"e{s}"))
        cur, cents = f"s{s}a0", f"seed{s}"
        for i in range(1, iters + 1):
            ctes.append(update(cur, f"s{s}c{i}"))
            ctes.append(assign(f"s{s}c{i}", f"s{s}a{i}", f"e{s}"))
            cur, cents = f"s{s}a{i}", f"s{s}c{i}"
        finals.append(
            f"SELECT {s} AS sub, cluster_id AS code, vec_id, d2 FROM {cur}"
        )
        cent_names.append(cents)
    return ctes, " UNION ALL ".join(finals), cent_names


def _pq_oracle_sql(m: int = 4, ksub: int = 16, iters: int = 2) -> str:
    """DuckDB replay of pq_encode: (sub, code) histogram + distortion."""
    ctes, union, _ = _pq_ctes(m, ksub, iters)
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    enc AS ({union})
    SELECT CAST(sub AS INTEGER) AS sub, code,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(SUM(d2), 6) AS distortion
    FROM enc GROUP BY sub, code
    ORDER BY sub, code"""
    )


def _pq_adc_oracle_sql(
    m: int = 4, ksub: int = 16, iters: int = 2, k: int = 3
) -> str:
    """DuckDB replay of pq_adc_topk: per-query distance tables against the
    final sub-codebooks, integer-micro partial distances summed over the
    corpus codes, (d, cand_id) ranking."""
    ctes, union, cent_names = _pq_ctes(m, ksub, iters)
    dq = (
        "list_sum(list_transform(list_zip(q.v, c.c_vec), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    dtabs = " UNION ALL ".join(
        f"""SELECT q.vec_id AS query_id, {s} AS sub, c.cluster_id AS code,
               CAST(ROUND({dq} * 1000000, 0) AS BIGINT) AS d_micro
        FROM (SELECT vec_id, v FROM e{s} WHERE vec_id % 100 = 0) q
        CROSS JOIN {cent_names[s]} c"""
        for s in range(m)
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    enc AS ({union}),
    dtab AS ({dtabs}),
    scored AS (
        SELECT d.query_id, e.vec_id AS cand_id, SUM(d.d_micro) AS d_micro
        FROM enc e JOIN dtab d ON d.sub = e.sub AND d.code = e.code
        WHERE d.query_id != e.vec_id
        GROUP BY d.query_id, e.vec_id
    )
    SELECT query_id, cand_id,
           CAST(d_micro AS DOUBLE) / 1000000.0 AS d_approx, rank
    FROM (
        SELECT query_id, cand_id, d_micro,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY d_micro, cand_id) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= {k}"""
    )


@register(
    "pq_encode_stats",
    oracle=_pq_oracle_sql(m=4, ksub=16, iters=2),
    survey="extension (similarity, compression tier): product quantization "
    "— 4 independent Lloyd sub-codebooks (16 codes each) over the "
    "vector's 16-dim slices, every vector encoded as its per-subspace "
    "argmin code; output is the (sub, code) histogram + total "
    "reconstruction distortion. The memory-bound ANN regime at 100 TB: "
    "m small codes per vector instead of d floats, trained and encoded "
    "with broadcast-assign passes (the data never shuffles or collects); "
    "DuckDB replays all 4x2 Lloyd rounds via the 9-dp quantized model "
    "state, so the code assignment is value-exact",
)
def pq_encode_stats(spark, sf_dir) -> DataFrame:
    """PQ codebook training + corpus encoding: per (subspace, code) member
    counts and summed reconstruction error."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double(F.col("embedding")).alias("v")
    )
    enc = sim.pq_encode(emb, m=4, ksub=16, iters=2)
    return (
        enc.groupBy("sub", "code")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.sum("d2"), 6).alias("distortion"),
        )
        .orderBy("sub", "code")
    )


@register(
    "pq_adc_topk",
    oracle=_pq_adc_oracle_sql(m=16, ksub=32, iters=2, k=3),
    survey="extension (similarity, compression tier): asymmetric-distance "
    "(ADC) top-k over PQ codes — per query the only float work is one "
    "m x ksub distance table (query slices x broadcast codebooks); the "
    "corpus is scored through its codes alone via a broadcast (sub, code) "
    "equi-join, never touched as floats. Partial distances quantize to "
    "integer micro-units so the m-way sums and the (d, cand) ranking are "
    "order-independent and cross-engine exact — the memory-bound ANN "
    "regime for 100 TB corpora. Geometry m=16 x 32 codes: measured "
    "recall@3 vs exact L2 = 0.73 (geometry ladder 4x16: 0.07, 8x16: "
    "0.40, 16x32: 0.73 recorded in BASELINE.md); all m subspaces train "
    "in ONE Lloyd pipeline (job count O(iters), not O(m*iters))",
)
def pq_adc_topk(spark, sf_dir) -> DataFrame:
    """PQ/ADC approximate nearest neighbors: top-3 per query (vec_id%100)
    by summed codebook-table distances (m=16 subspaces x 32 codes).
    Serves against the staged model (index built once per corpus) — the
    timed path is ADC serving, not Lloyd training."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double(F.col("embedding")).alias("v")
    )
    return sim.pq_adc_topk(
        emb, query_pred=F.col("vec_id") % 100 == 0, k=3, m=16, ksub=32,
        iters=2, model=_pq_staged_model(spark, sf_dir, m=16, ksub=32, iters=2),
    )


#: Two-stage-serving shortlist rule: GREATEST(floor, N // divisor).
#: BASELINE.md's sf0.1 ladder measured recall@3 = 0.75 at the fixed
#: sf0.01-calibrated shortlist 20 vs 0.95 at 80 — the rule reproduces
#: BOTH calibration points (20 @ N=500, 80 @ N=2000) as a deterministic
#: integer expression either engine evaluates identically (round-6
#: verdict item 3: the ~N/25 production rule moves from prose to code,
#: same corpus-sized-geometry policy as num_hyperplanes_for).
PQ_SHORTLIST_FLOOR = 20
PQ_SHORTLIST_DIVISOR = 25

#: Incremental-ingest gate: vec_id % PQ_BATCH_MOD == 0 rows simulate the
#: arriving batch (the vector analog of dedup_incremental_batch's daily
#: gate).  Load-bearing in THREE places that must agree — the census
#: split (`pq_ingest_batch_pred`), the batch-twin oracle SQL, and the
#: streaming source staging (jobs._stage_emb_batch_dir); a divergence
#: silently double-counts vectors as history AND batch.
PQ_BATCH_MOD = 10


def pq_ingest_batch_pred():
    """The shared is-this-row-in-the-ingest-batch predicate."""
    return F.col("vec_id") % PQ_BATCH_MOD == 0


def pq_shortlist_for(corpus_size: int) -> int:
    """Scale-aware ADC re-rank shortlist: max(floor, N // divisor)."""
    return max(PQ_SHORTLIST_FLOOR, corpus_size // PQ_SHORTLIST_DIVISOR)


_EMB_COUNT_MEMO: dict[tuple, int] = {}


def _emb_corpus_count(spark, sf_dir: str) -> int:
    """Corpus size for index sizing — index-build metadata, counted ONCE
    per (session, corpus version) instead of per query call (round-7
    self-review: the per-call count() was an extra full-scan job on
    every bench/sweep invocation)."""
    import os as _os

    st = _os.stat(_os.path.join(sf_dir, "embeddings.parquet"))
    key = (id(spark), sf_dir, st.st_mtime_ns, st.st_size)
    if key not in _EMB_COUNT_MEMO:
        _EMB_COUNT_MEMO[key] = t(spark, sf_dir, "embeddings").count()
    return _EMB_COUNT_MEMO[key]


def _pq_adc_rerank_oracle_sql(
    m: int = 16, ksub: int = 32, iters: int = 2, k: int = 3,
    shortlist_floor: int | None = None,
    shortlist_divisor: int | None = None,
) -> str:
    """DuckDB replay of pq_adc_rerank_topk: the ADC oracle ranked to the
    corpus-derived shortlist (GREATEST(floor, COUNT(*) // divisor) —
    same integer rule as ``pq_shortlist_for``), joined back to full
    vectors for an exact-L2 integer-micro re-rank."""
    sl_floor = (
        PQ_SHORTLIST_FLOOR if shortlist_floor is None else shortlist_floor
    )
    sl_div = (
        PQ_SHORTLIST_DIVISOR
        if shortlist_divisor is None
        else shortlist_divisor
    )
    ctes, union, cent_names = _pq_ctes(m, ksub, iters)
    dq = (
        "list_sum(list_transform(list_zip(q.v, c.c_vec), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    dtabs = " UNION ALL ".join(
        f"""SELECT q.vec_id AS query_id, {s} AS sub, c.cluster_id AS code,
               CAST(ROUND({dq} * 1000000, 0) AS BIGINT) AS d_micro
        FROM (SELECT vec_id, v FROM e{s} WHERE vec_id % 100 = 0) q
        CROSS JOIN {cent_names[s]} c"""
        for s in range(m)
    )
    dx = (
        "list_sum(list_transform(list_zip(q.v, c.v), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    enc AS ({union}),
    dtab AS ({dtabs}),
    scored AS (
        SELECT d.query_id, e.vec_id AS cand_id, SUM(d.d_micro) AS d_micro
        FROM enc e JOIN dtab d ON d.sub = e.sub AND d.code = e.code
        WHERE d.query_id != e.vec_id
        GROUP BY d.query_id, e.vec_id
    ),
    sl AS (
        SELECT GREATEST({sl_floor},
                        CAST(COUNT(*) AS BIGINT) // {sl_div})
               AS s
        FROM embeddings
    ),
    short AS (
        SELECT query_id, cand_id FROM (
            SELECT query_id, cand_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY d_micro, cand_id) AS rn
            FROM scored
        ) WHERE rn <= (SELECT s FROM sl)
    ),
    efull AS (SELECT vec_id, {_EMB} AS v FROM embeddings),
    exact AS (
        SELECT s.query_id, s.cand_id,
               CAST(ROUND({dx} * 1000000, 0) AS BIGINT) AS d_micro
        FROM short s
        JOIN efull q ON q.vec_id = s.query_id
        JOIN efull c ON c.vec_id = s.cand_id
    )
    SELECT query_id, cand_id,
           CAST(d_micro AS DOUBLE) / 1000000.0 AS d_exact, rank
    FROM (
        SELECT query_id, cand_id, d_micro,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY d_micro, cand_id) AS BIGINT) AS rank
        FROM exact
    ) WHERE rank <= {k}"""
    )


@register(
    "pq_adc_rerank_topk",
    oracle=_pq_adc_rerank_oracle_sql(m=16, ksub=32, iters=2, k=3),
    survey="extension (similarity, compression tier): two-stage ANN "
    "serving — ADC shortlists GREATEST(20, N//25) candidates per query "
    "(corpus-derived, same deterministic-integer-sizing policy as "
    "num_hyperplanes_for — fixed geometry degraded recall@3 to 0.75 at "
    "10x corpus, the rule restores 0.95 per BASELINE.md's ladder) "
    "through codes alone, then ONLY those rows join back to full "
    "vectors (keyed equi-join, bounded fetch) for an exact-L2 integer-"
    "micro re-rank; the coarse-then-refine production path. Measured "
    "recall@3 vs exact brute force: 0.93 at sf0.01, >=0.95 at sf0.1 "
    "(pinned in tests/test_vectors_recall.py)",
)
def pq_adc_rerank_topk(spark, sf_dir) -> DataFrame:
    """ADC shortlist (GREATEST(20, N//25) — ``pq_shortlist_for``; the
    count is index-build metadata, one scalar at plan time like
    embedding_neardup_adaptive's H) + exact re-rank top-3 per query
    (vec_id%100), served against the staged model (_pq_staged_model)."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double(F.col("embedding")).alias("v")
    )
    return sim.pq_adc_rerank_topk(
        emb, query_pred=F.col("vec_id") % 100 == 0, k=3,
        shortlist=pq_shortlist_for(_emb_corpus_count(spark, sf_dir)),
        m=16, ksub=32, iters=2,
        model=_pq_staged_model(spark, sf_dir, m=16, ksub=32, iters=2),
    )


#: hi-fidelity tier shortlist: HALF the standard divisor's fan-out —
#: the deeper codebooks (ksub=64, iters=4) buy the recall back, so the
#: exact-L2 re-rank float-scores half the candidates for the same >=0.95
#: recall point (measured, BASELINE.md "ADC re-rank frontier r12").
PQ_HI_SHORTLIST_DIVISOR = 50


@register(
    "pq_adc_rerank_hi_topk",
    oracle=_pq_adc_rerank_oracle_sql(
        m=16, ksub=64, iters=4, k=3,
        shortlist_divisor=PQ_HI_SHORTLIST_DIVISOR,
    ),
    survey="extension (similarity, compression tier — round-12 frontier "
    "push): the ADC re-rank ladder's next rung is CODEBOOK DEPTH, not a "
    "rotation or residual stage — m=16 x ksub=64, 4 Lloyd iterations "
    "shortlists GREATEST(20, N//50) (HALF the m16x32 tier's fan-out) "
    "and measures recall@3 0.967 at sf0.1 vs the old tier's 0.950 at "
    "double the float-scored candidates (BASELINE frontier table).  "
    "OPQ-PCA rotation and residual-vs-coarse-centroid encoding were "
    "both built and measured on this corpus and RECORDED AS NEGATIVES "
    "(rotation ties at best on these near-isotropic embeddings, "
    "residuals lose at small shortlists — BASELINE.md); ksub/iters cost "
    "only index-build time (staged, train-once), serving cost is "
    "unchanged (m code lookups per candidate).  Same exactness contract "
    "and DuckDB full-Lloyd replay as pq_adc_rerank_topk",
)
def pq_adc_rerank_hi_topk(spark, sf_dir) -> DataFrame:
    """Hi-fidelity ADC re-rank: deeper sub-codebooks (m=16 x 64, 4 Lloyd
    rounds) halve the exact-re-rank shortlist (GREATEST(20, N//50)) at
    equal-or-better recall — served against its own staged index."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double(F.col("embedding")).alias("v")
    )
    n = _emb_corpus_count(spark, sf_dir)
    return sim.pq_adc_rerank_topk(
        emb, query_pred=F.col("vec_id") % 100 == 0, k=3,
        shortlist=max(PQ_SHORTLIST_FLOOR, n // PQ_HI_SHORTLIST_DIVISOR),
        m=16, ksub=64, iters=4,
        model=_pq_staged_model(spark, sf_dir, m=16, ksub=64, iters=4),
    )


_SEM_COS_XY = _COS.replace("q.", "x.").replace("c.", "y.")


@register(
    "semantic_dedup_prune",
    oracle=f"""
    WITH base AS (SELECT vec_id, {_EMB} AS v FROM embeddings),
    aug AS (
        SELECT vec_id, v FROM base
        UNION ALL  -- identical copies: sim 1.0 inside the same cluster
        SELECT vec_id + 100000, v FROM base WHERE vec_id % 25 = 0
        UNION ALL  -- scaled copies: sim 1.0 (norm-invariance)
        SELECT vec_id + 200000, list_transform(v, x -> x * 2.0)
        FROM base WHERE vec_id % 50 = 0
    ),
    cent AS (SELECT vec_id AS centroid_id, v AS c_vec FROM base
             WHERE vec_id % 100 = 1),
    scored AS (
        SELECT a.vec_id, a.v, cent.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                   ORDER BY ROUND(list_dot_product(a.v, cent.c_vec) / NULLIF(
                       sqrt(list_dot_product(a.v, a.v))
                       * sqrt(list_dot_product(cent.c_vec, cent.c_vec)),
                       0.0), 6) DESC, cent.centroid_id) AS rn
        FROM aug a CROSS JOIN cent
    ),
    member AS (SELECT vec_id, v, centroid_id FROM scored WHERE rn = 1),
    dup_pairs AS (
        SELECT x.centroid_id, y.vec_id AS pruned_id
        FROM member x JOIN member y
          ON x.centroid_id = y.centroid_id AND x.vec_id < y.vec_id
        WHERE {_SEM_COS_XY} >= 0.9
    ),
    pruned AS (SELECT DISTINCT centroid_id, pruned_id FROM dup_pairs)
    SELECT m.centroid_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(COUNT(p.pruned_id) AS BIGINT) AS n_pruned,
           CAST(COUNT(*) - COUNT(p.pruned_id) AS BIGINT) AS n_kept
    FROM member m LEFT JOIN pruned p
      ON p.centroid_id = m.centroid_id AND p.pruned_id = m.vec_id
    GROUP BY m.centroid_id
    ORDER BY m.centroid_id
    """,
    survey="extension (dedup, embedding tier — SemDeDup, Abbas et al. "
    "2023 arXiv:2303.09540): cluster-scoped semantic deduplication. "
    "Vectors are coarse-assigned to deterministic seed centroids "
    "(broadcast argmin, map-only — same pass as the IVF index), then "
    "near-duplicate detection runs as a self-equi-join ON THE CLUSTER ID "
    "— pairwise cosine is quadratic only within a cluster (|c|^2), never "
    "across the corpus, which is the published algorithm's scaling "
    "argument; prune rule keeps the lowest vec_id per duplicate pair. "
    "Injected duplicate copies (identical + scaled) make the prune "
    "non-vacuous on the random testdata, same policy as "
    "embedding_cosine_neardup",
)
def semantic_dedup_prune(spark, sf_dir) -> DataFrame:
    """Per-cluster membership and prune counts for SemDeDup-style
    semantic deduplication: coarse k-partition via nearest seed centroid,
    exact cosine near-dup pruning within each cluster only."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double(F.col("embedding")).alias("v")
    )
    copies = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "v"
    )
    scaled = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 200000).alias("vec_id"),
        F.transform("v", lambda x: x * F.lit(2.0)).alias("v"),
    )
    aug = emb.unionByName(copies).unionByName(scaled)
    centroids = emb.filter(F.col("vec_id") % 100 == 1)
    # member feeds three consumers (both self-join sides + the final
    # membership count); materializing it once was measured NET-WORSE at
    # sf0.1 (localCheckpoint build +0.75 s vs ~0.22 s per map-only
    # broadcast-argmin recompute), so the recompute stays — it is a scan
    # + broadcast argmin with no shuffle, the cheap kind of recompute.
    member = sim.ivf_assign(aug, centroids)

    x = member.select(
        F.col("centroid_id"),
        F.col("vec_id").alias("x_id"),
        F.col("v").alias("x_v"),
        sim.norm(F.col("v")).alias("x_n"),
    )
    y = member.select(
        F.col("centroid_id"),
        F.col("vec_id").alias("pruned_id"),
        F.col("v").alias("y_v"),
        sim.norm(F.col("v")).alias("y_n"),
    )
    pruned = (
        x.join(y, "centroid_id")
        .filter(F.col("x_id") < F.col("pruned_id"))
        .filter(
            F.round(
                sim.cosine_pre(
                    F.col("x_v"), F.col("x_n"), F.col("y_v"), F.col("y_n")
                ),
                6,
            )
            >= 0.9
        )
        .select(
            F.col("centroid_id").alias("p_cid"),
            F.col("pruned_id"),
        )
        .distinct()
    )
    return (
        member.join(
            pruned,
            (F.col("centroid_id") == F.col("p_cid"))
            & (F.col("vec_id") == F.col("pruned_id")),
            "left",
        )
        .groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.count("pruned_id").alias("n_pruned"),
            (F.count(F.lit(1)) - F.count("pruned_id")).alias("n_kept"),
        )
        .orderBy("centroid_id")
    )


def _ivfpq_oracle_sql(
    m: int = 16, ksub: int = 32, iters: int = 2, k: int = 3, nprobe: int = 2
) -> str:
    """DuckDB replay of IVF-PQ serving: the _pq_ctes Lloyd replay supplies
    the encoded corpus + final sub-codebooks; an IVF layer (deterministic
    seed centroids vec_id%100=1, rounded-cosine argmin assignment, nprobe
    probe cells per query) restricts WHICH (query, cand) pairs the ADC
    sum runs over."""
    ctes, union, cent_names = _pq_ctes(m, ksub, iters)
    dq = (
        "list_sum(list_transform(list_zip(q.v, c.c_vec), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    dtabs = " UNION ALL ".join(
        f"""SELECT q.vec_id AS query_id, {s} AS sub, c.cluster_id AS code,
               CAST(ROUND({dq} * 1000000, 0) AS BIGINT) AS d_micro
        FROM (SELECT vec_id, v FROM e{s} WHERE vec_id % 100 = 0) q
        CROSS JOIN {cent_names[s]} c"""
        for s in range(m)
    )
    ivf_cos = (
        "ROUND(list_dot_product(e.v, cent.c_vec) / NULLIF("
        "sqrt(list_dot_product(e.v, e.v)) "
        "* sqrt(list_dot_product(cent.c_vec, cent.c_vec)), 0.0), 6)"
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    enc AS ({union}),
    dtab AS ({dtabs}),
    emb0 AS (SELECT vec_id, {_EMB} AS v FROM embeddings),
    ivf_cent AS (SELECT vec_id AS centroid_id, v AS c_vec FROM emb0
                 WHERE vec_id % 100 = 1),
    ivf_scored AS (
        SELECT e.vec_id, cent.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY {ivf_cos} DESC, cent.centroid_id) AS rn
        FROM emb0 e CROSS JOIN ivf_cent cent
    ),
    home AS (SELECT vec_id AS cand_id, centroid_id FROM ivf_scored
             WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, centroid_id FROM ivf_scored
               WHERE vec_id % 100 = 0 AND rn <= {nprobe}),
    scored AS (
        SELECT d.query_id, e.vec_id AS cand_id, SUM(d.d_micro) AS d_micro
        FROM enc e
        JOIN home h ON h.cand_id = e.vec_id
        JOIN probes p ON p.centroid_id = h.centroid_id
        JOIN dtab d ON d.sub = e.sub AND d.code = e.code
                   AND d.query_id = p.query_id
        WHERE d.query_id != e.vec_id
        GROUP BY d.query_id, e.vec_id
    )
    SELECT query_id, cand_id,
           CAST(d_micro AS DOUBLE) / 1000000.0 AS d_approx, rank
    FROM (
        SELECT query_id, cand_id, d_micro,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY d_micro, cand_id) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= {k}"""
    )


@register(
    "ivfpq_adc_topk",
    oracle=_ivfpq_oracle_sql(m=16, ksub=32, iters=2, k=3, nprobe=2),
    survey="extension (similarity, combined index — FAISS IVFPQ shape): "
    "IVF coarse cells prune WHICH candidates are scored (nprobe x "
    "N/nlist per query), PQ/ADC codes decide HOW (m integer-micro code "
    "lookups, no floats) — the two pruning dimensions compound, which "
    "is how billion-vector serving stays sub-linear AND memory-bound. "
    "Candidate restriction is an equi-join on the cell id BEFORE any "
    "distance work; the encoded-corpus x candidate join is shuffle-hash "
    "(broadcast only valid for small serving batches); serves against "
    "the staged PQ index. DuckDB replays the full Lloyd training + IVF "
    "assignment + restricted ADC sum, value-exact",
)
def ivfpq_adc_topk(spark, sf_dir) -> DataFrame:
    """IVF-PQ combined serving: top-3 per query (vec_id%100==0), nprobe=2
    over seed centroids (vec_id%100==1), ADC-scored through the staged
    m=16 x 32 PQ index."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double(F.col("embedding")).alias("v")
    )
    centroids = emb.filter(F.col("vec_id") % 100 == 1)
    return sim.ivfpq_adc_topk(
        emb,
        centroids,
        query_pred=F.col("vec_id") % 100 == 0,
        k=3,
        nprobe=2,
        m=16,
        ksub=32,
        iters=2,
        model=_pq_staged_model(spark, sf_dir, m=16, ksub=32, iters=2),
    )


def _pq_incremental_oracle_sql(
    m: int = 16, ksub: int = 32, iters: int = 2
) -> str:
    """DuckDB replay of pq_incremental_assign: full PQ training -> encoded
    corpus (= staged index), batch re-assigned against the FINAL
    per-subspace codebooks (the honest replay of the frozen-codebook
    incremental encode, not an asserted constant), cell census + drift.
    ``enc`` is referenced twice (census + drift) so it is MATERIALIZED —
    the round-5 CTE-inlining lesson."""
    ctes, union, cent_names = _pq_ctes(m, ksub, iters)
    d2 = (
        "list_sum(list_transform(list_zip(e.v, s.c_vec), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    reassigns = " UNION ALL ".join(
        f"""SELECT {s} AS sub, cluster_id AS code, vec_id FROM (
            SELECT vec_id, cluster_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                       ORDER BY d2, cluster_id) AS rn
            FROM (SELECT e.vec_id, s.cluster_id, {d2} AS d2
                  FROM (SELECT vec_id, v FROM e{s}
                        WHERE vec_id % {PQ_BATCH_MOD} = 0) e
                  CROSS JOIN {cent_names[s]} s)
        ) WHERE rn = 1"""
        for s in range(m)
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    enc AS MATERIALIZED ({union}),
    inc AS ({reassigns}),
    drift AS (
        SELECT r.sub, r.code,
               CAST(SUM(CASE WHEN r.code != f.code THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_code_drift
        FROM inc r JOIN enc f ON f.vec_id = r.vec_id AND f.sub = r.sub
        GROUP BY r.sub, r.code),
    cells AS (
        SELECT sub, code,
               CAST(COUNT(*) FILTER (WHERE vec_id % {PQ_BATCH_MOD} != 0)
                    AS BIGINT) AS n_history,
               CAST(COUNT(*) FILTER (WHERE vec_id % {PQ_BATCH_MOD} = 0)
                    AS BIGINT) AS n_batch,
               CAST(COUNT(*) AS BIGINT) AS n_merged
        FROM enc GROUP BY sub, code)
    SELECT CAST(c.sub AS INTEGER) AS sub, c.code, c.n_history, c.n_batch,
           c.n_merged,
           CAST(COALESCE(d.n_code_drift, 0) AS BIGINT) AS n_code_drift
    FROM cells c LEFT JOIN drift d ON d.sub = c.sub AND d.code = c.code
    ORDER BY c.sub, c.code"""
    )


@register(
    "pq_incremental_assign",
    oracle=_pq_incremental_oracle_sql(m=16, ksub=32, iters=2),
    survey="extension (similarity, index maintenance): incremental ANN "
    "index maintenance — a new ingest batch (vec_id % 10 = 0, the vector "
    "analog of dedup_incremental_batch's daily gate) is encoded against "
    "the STAGED PQ index's frozen codebooks (one broadcast join + "
    "map-side min(struct) argmin over the batch ONLY) and unioned with "
    "the staged historical codes, which are read back from the staged "
    "parquet and never re-encoded (plan-pinned: one embeddings scan for "
    "the batch, zero Lloyd work). Output is the per-(subspace, code) "
    "cell census of the merged index plus n_code_drift — batch codes "
    "that differ from a full rebuild's assignment; identically 0 "
    "because frozen-codebook assignment is per-vector deterministic, "
    "which is why incremental maintenance is EXACT here (ADC serving "
    "over the merged index is row-identical to the staged full index — "
    "pinned by test). The oracle honestly re-derives the drift by "
    "re-assigning the batch against the final codebooks",
)
def pq_incremental_assign(spark, sf_dir) -> DataFrame:
    """Daily-ingest maintenance of the staged PQ ANN index: encode the
    batch against frozen codebooks, merge with untouched history, report
    the merged cell census + code drift vs a full rebuild (always 0).

    100 TB shape: index maintenance cost is O(batch), not O(corpus) —
    the historical encoded corpus is a parquet read, the codebooks a
    broadcast; nothing retrains and recall is unchanged by construction."""
    encoded, codebooks = _pq_staged_model(spark, sf_dir, m=16, ksub=32, iters=2)
    is_batch = pq_ingest_batch_pred()
    batch_raw = (
        t(spark, sf_dir, "embeddings")
        .filter(is_batch)
        .select("vec_id", sim.as_double(F.col("embedding")).alias("v"))
    )
    # batch_enc has a SINGLE consumer inside _merged_cell_census, so the
    # batch is encoded exactly once (a second consumer would re-execute
    # the whole encode subplan; plan-pinned as one embeddings scan)
    batch_enc = sim.pq_encode_frozen(batch_raw, codebooks, m=16)
    return _merged_cell_census(encoded, batch_enc)


def _merged_cell_census(encoded: DataFrame, batch_enc: DataFrame) -> DataFrame:
    """Shared merge/census/drift tail of the incremental-maintenance pair
    (batch ``pq_incremental_assign``, streaming
    ``stream_pq_incremental_assign``): one pass — history rows from the
    staged index carry (is_batch=0, drift=0); freshly-encoded batch rows
    (vec_id, sub, code) join the staged batch codes once to compute their
    drift flag; then a single grouped census per (sub, code) cell."""
    is_batch = pq_ingest_batch_pred()
    hist_rows = encoded.filter(~is_batch).select(
        "sub",
        "code",
        F.lit(0).alias("is_b"),
        F.lit(0).alias("drift_i"),
    )
    staged_batch = encoded.filter(is_batch).select(
        "vec_id", "sub", F.col("code").alias("staged_code")
    )
    batch_rows = batch_enc.join(staged_batch, ["vec_id", "sub"]).select(
        "sub",
        "code",
        F.lit(1).alias("is_b"),
        F.when(F.col("code") != F.col("staged_code"), 1)
        .otherwise(0)
        .alias("drift_i"),
    )
    return (
        hist_rows.unionByName(batch_rows)
        .groupBy("sub", "code")
        .agg(
            F.sum(1 - F.col("is_b")).cast("long").alias("n_history"),
            F.sum("is_b").cast("long").alias("n_batch"),
            F.count(F.lit(1)).cast("long").alias("n_merged"),
            F.sum("drift_i").cast("long").alias("n_code_drift"),
        )
        .orderBy("sub", "code")
    )


@register(
    "embedding_dim_profile",
    oracle="""
    WITH comp AS (
      SELECT i - 1 AS dim,
             -- the DOUBLE cast is load-bearing: raw embedding[i] is FLOAT
             -- and DuckDB keeps FLOAT*1000 in float32, whose product can
             -- cross a rounding boundary the double product doesn't (one
             -- component at sf0.1 did — found by the round-5 sf0.1 sweep);
             -- Spark quantizes the double cast, so the oracle must too
             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000, 0) AS BIGINT)
                 AS milli
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
    ),
    prof AS (
      SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(milli) AS BIGINT) AS s,
             CAST(SUM(milli * milli) AS BIGINT) AS s2,
             CAST(MIN(milli) AS BIGINT) AS mn,
             CAST(MAX(milli) AS BIGINT) AS mx
      FROM comp GROUP BY dim
    )
    SELECT CAST(dim AS BIGINT) AS dim, n, mn AS min_milli, mx AS max_milli,
           ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_milli,
           ROUND(SQRT((CAST(s2 AS DOUBLE)
                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                         / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)), 6)
               AS std_milli,
           (mx = mn) AS is_dead_dim
    FROM prof ORDER BY dim
    """,
    survey="extension (embedding QA): per-dimension embedding profile — "
    "posexplode to (dim, milli-component), one map-side-combining groupBy "
    "for n/sum/sumsq/min/max per dimension (64 groups at any corpus "
    "size), mean/std from integer sums via a fixed IEEE tree, dead-"
    "dimension flag (min == max). The vector-column health check a "
    "training pipeline runs before ANN indexing or model ingest — "
    "collapsed or constant dimensions silently break cosine geometry. "
    "No reference analog",
    tags=("vectors",),
)
def embedding_dim_profile(spark, sf_dir) -> DataFrame:
    """Per-dimension stats over the embedding corpus: range, mean, std,
    dead-dim flag. Output is dimension-count-sized regardless of corpus."""
    emb = t(spark, sf_dir, "embeddings")
    comp = emb.select(
        F.posexplode(sim.as_double(F.col("embedding"))).alias("dim", "x")
    ).select(
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("x") * 1000, 0).cast("long").alias("milli"),
    )
    prof = comp.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("milli").cast("long").alias("s"),
        F.sum(F.col("milli") * F.col("milli")).cast("long").alias("s2"),
        F.min("milli").alias("min_milli"),
        F.max("milli").alias("max_milli"),
    )
    n_d = F.col("n").cast("double")
    s_d = F.col("s").cast("double")
    var = (F.col("s2").cast("double") - s_d * s_d / n_d) / n_d
    return prof.select(
        "dim",
        "n",
        "min_milli",
        "max_milli",
        F.round(s_d / n_d, 6).alias("mean_milli"),
        F.round(F.sqrt(var), 6).alias("std_milli"),
        (F.col("max_milli") == F.col("min_milli")).alias("is_dead_dim"),
    ).orderBy("dim")


@register(
    "embedding_dim_covariance",
    oracle="""
    WITH q AS (
      -- DOUBLE cast before quantization, same policy as dim_profile
      SELECT vec_id,
             list_transform(embedding,
                            v -> CAST(ROUND(CAST(v AS DOUBLE) * 10000, 0)
                                      AS BIGINT)) AS q
      FROM embeddings
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q),
    dims AS (
      SELECT vec_id, i - 1 AS i, q[i] AS x
      FROM q, UNNEST(range(1, len(q) + 1)) AS u(i)
    ),
    sums AS (SELECT i, CAST(SUM(x) AS BIGINT) AS sx FROM dims GROUP BY i),
    sxy AS (
      SELECT a.i AS i, b.i AS j, CAST(SUM(a.x * b.x) AS BIGINT) AS sxy
      FROM dims a JOIN dims b ON a.vec_id = b.vec_id AND a.i < b.i
      GROUP BY a.i, b.i
    )
    SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j,
           (n.n * p.sxy - sa.sx * sb.sx) AS cov_num,
           ROUND(CAST(n.n * p.sxy - sa.sx * sb.sx AS DOUBLE)
                 / (CAST(n.n AS DOUBLE) * CAST(n.n AS DOUBLE)
                    * 100000000.0), 9) AS cov
    FROM sxy p CROSS JOIN n
    JOIN sums sa ON sa.i = p.i
    JOIN sums sb ON sb.i = p.j
    ORDER BY ABS(n.n * p.sxy - sa.sx * sb.sx) DESC, p.i, p.j
    LIMIT 20
    """,
    survey="extension (embedding QA): top-20 most-correlated dimension "
    "pairs from the EXACT integer covariance identity "
    "n*Sxy - Sx*Sy over quantized components — the redundancy check "
    "(near-duplicate dimensions) that complements dim_profile's dead-"
    "dimension check before ANN indexing / PQ subspace splitting. No "
    "reference analog",
    tags=("vectors",),
)
def embedding_dim_covariance(spark, sf_dir) -> DataFrame:
    """Top-|cov| off-diagonal covariance pairs over the embedding corpus.

    Exactness: components quantize to BIGINT at 1e4 (same double-cast
    policy as dim_profile), and covariance uses the all-integer identity
    ``cov_num = n*Sxy - Sx*Sy`` (scale n^2 * 1e8) — integer sums are
    order-independent, so Spark's parallel partials and DuckDB's
    sequential scan agree bit-for-bit, and the one closing division is a
    single exactly-rounded IEEE op.  Bounds: |x'| <= 1e4 max-normalized
    components, so Sxy <= corpus * 1e8 and Sx*Sy <= (corpus * 1e4)^2 —
    BIGINT-safe to ~1e5x this corpus; re-scale to 1e3 past that.

    Plan shape (round-12 rewrite, guide §4.2): the per-partition partial
    Gram matrix is computed in ONE vectorized ``mapInArrow`` pass — each
    task reduces its rows to d*(d-1)/2 pair sums + d dimension sums + a
    row count via an int64 numpy ``M.T @ M`` (integer matmul — exact, so
    the partials are bit-identical to the JVM fold they replace), and
    only those ~2,081 partial rows per task cross the single shuffle.
    This replaced the interpreted JVM expansion (explode of d*(d-1)/2
    structs per row: N x 2,016 generated rows through a hash aggregate)
    plus TWO extra scans (posexplode dimension sums, count) — measured
    2.45 s -> 0.97 s bench-like at sf0.1 local[32]; shuffle bytes unchanged
    (partials were already map-side-combined), the win is native batch
    math replacing per-element interpreted expressions.  Quantization
    stays in the JVM (same cast/round expression the oracle replays), so
    the Python side never touches a float.  Never a vec_id self-join:
    the oracle states that quadratic form, the engine never executes it."""
    emb = t(spark, sf_dir, "embeddings")
    q = emb.select(
        F.expr(
            "transform(embedding,"
            " v -> cast(round(cast(v as double) * 10000, 0) as bigint))"
        ).alias("q")
    )

    def _gram_partials(batches):
        import numpy as np
        import pyarrow as pa

        d_seen = 0
        sxy_m = np.zeros((0, 0), dtype=np.int64)
        sx_v = np.zeros(0, dtype=np.int64)
        n_rows = 0
        for batch in batches:
            arr = batch.column(0)
            offs = arr.offsets.to_numpy()
            # Non-null element contract (round-12 advice): a NULL inside
            # an embedding array would make to_numpy(zero_copy_only=False)
            # fall back to float64-with-NaN, and the in-place int64 add
            # below would raise an opaque TypeError.  The quantization
            # expression upstream yields NULL only for NULL inputs, and
            # the corpus contract is non-null fixed-dim vectors — fail
            # with the contract named instead of a dtype crash.  (The
            # prior SQL-expression path SUM-skipped such nulls silently,
            # which is a divergence, not a behavior to preserve.)
            if arr.values.null_count:
                raise ValueError(
                    "embedding_dim_covariance: NULL element inside an "
                    "embedding vector — the corpus contract is non-null "
                    "components (TESTDATA.md); integer Gram partials "
                    "cannot skip elements the way SUM does"
                )
            vals = arr.values.to_numpy(zero_copy_only=False)
            lengths = np.diff(offs)
            n_rows += len(lengths)
            if len(vals) == 0 or lengths.max(initial=0) == 0:
                continue
            l_max = int(lengths.max())
            if l_max > d_seen:
                grown = np.zeros((l_max, l_max), dtype=np.int64)
                grown[:d_seen, :d_seen] = sxy_m
                sxy_m = grown
                sx_v = np.concatenate(
                    [sx_v, np.zeros(l_max - d_seen, dtype=np.int64)]
                )
                d_seen = l_max
            # rows grouped by length: ragged corpora stay exact — a
            # length-L row contributes to sx[:L] and pairs i<j<L only
            # (the <2-dim rows count toward n/sx but yield no pairs,
            # pinned by the round-10 ragged-vector parity test)
            for l_cur in np.unique(lengths):
                if l_cur == 0:
                    continue
                idx = np.nonzero(lengths == l_cur)[0]
                gather = (
                    offs[idx][:, None] + np.arange(l_cur)[None, :]
                ).ravel()
                m_rows = vals[gather].reshape(len(idx), l_cur)
                sx_v[:l_cur] += m_rows.sum(axis=0, dtype=np.int64)
                sxy_m[:l_cur, :l_cur] += m_rows.T @ m_rows
        iu, ju = np.triu_indices(d_seen, k=1)
        out_i = np.concatenate([iu, np.arange(d_seen), [-1]]).astype("int32")
        out_j = np.concatenate(
            [ju, np.full(d_seen, -1), [-1]]
        ).astype("int32")
        out_s = np.concatenate(
            [sxy_m[iu, ju], sx_v, [n_rows]]
        ).astype("int64")
        yield pa.RecordBatch.from_arrays(
            [pa.array(out_i), pa.array(out_j), pa.array(out_s)],
            names=["i", "j", "s"],
        )

    partials = q.mapInArrow(_gram_partials, "i int, j int, s long")
    # one tiny aggregate over (tasks x ~2,081) partial rows; materialized
    # once so the three consumers below don't re-run the corpus pass
    agg = (
        partials.groupBy("i", "j")
        .agg(F.sum("s").cast("long").alias("s"))
        .localCheckpoint(eager=True)
    )
    sxy = agg.filter(F.col("j") >= 0).select(
        "i", "j", F.col("s").alias("sxy")
    )
    n_row = agg.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("s").alias("n")
    )
    sums = agg.filter((F.col("i") >= 0) & (F.col("j") == -1))
    sa = sums.select(F.col("i").alias("_ai"), F.col("s").alias("sxa"))
    sb = sums.select(F.col("i").alias("_bj"), F.col("s").alias("sxb"))
    joined = (
        sxy.crossJoin(F.broadcast(n_row))
        .join(F.broadcast(sa), F.col("i") == F.col("_ai"))
        .join(F.broadcast(sb), F.col("j") == F.col("_bj"))
    )
    cov_num = F.col("n") * F.col("sxy") - F.col("sxa") * F.col("sxb")
    n_d = F.col("n").cast("double")
    return (
        joined.select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            cov_num.alias("cov_num"),
            F.round(
                cov_num.cast("double") / (n_d * n_d * F.lit(1e8)), 9
            ).alias("cov"),
        )
        .orderBy(F.abs(F.col("cov_num")).desc(), "i", "j")
        .limit(20)
    )


def _gcos(qv: str, cv: str) -> str:
    """6dp cosine between two DOUBLE[] expressions (the repo's
    cross-engine exactness contract), alias-parameterized."""
    return (
        f"ROUND(list_dot_product({qv}, {cv}) / NULLIF("
        f"sqrt(list_dot_product({qv}, {qv})) * "
        f"sqrt(list_dot_product({cv}, {cv})), 0.0), 6)"
    )


@register(
    "graph_ann_ivf_beam_topk",
    oracle=f"""
    -- graph-ANN tier: per-IVF-cell neighbor graph (degree 6), fixed
    -- per-cell entry point, 2 beam-expansion rounds (beam 8) — the
    -- oracle unrolls the bounded search exactly.  MATERIALIZED on every
    -- chained CTE: the rounds reference each other repeatedly and
    -- DuckDB would otherwise inline them exponentially (verify-skill
    -- gotcha).
    WITH e AS MATERIALIZED (SELECT vec_id, {_EMB} AS v FROM embeddings),
    cent AS MATERIALIZED (
      SELECT vec_id AS centroid_id, v AS c_vec FROM e
      WHERE vec_id % 100 = 1
    ),
    routed AS MATERIALIZED (
      SELECT e.vec_id, e.v, cent.centroid_id,
             {_gcos('e.v', 'cent.c_vec')} AS c_sim,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {_gcos('e.v', 'cent.c_vec')} DESC,
                          cent.centroid_id) AS rn
      FROM e CROSS JOIN cent
    ),
    home AS MATERIALIZED (
      SELECT vec_id, v, centroid_id, c_sim FROM routed WHERE rn = 1
    ),
    entry AS MATERIALIZED (
      SELECT centroid_id, vec_id AS entry_id FROM (
        SELECT centroid_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY centroid_id
                   ORDER BY c_sim DESC, vec_id) AS ern
        FROM home
      ) WHERE ern = 1
    ),
    edges AS MATERIALIZED (
      SELECT src, dst FROM (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                   ORDER BY {_gcos('a.v', 'b.v')} DESC, b.vec_id) AS rn
        FROM home a JOIN home b
          ON a.centroid_id = b.centroid_id AND a.vec_id != b.vec_id
      ) WHERE rn <= 6
    ),
    q AS MATERIALIZED (
      SELECT vec_id AS query_id, v AS q_vec, centroid_id FROM home
      WHERE vec_id % 100 = 0
    ),
    v0 AS MATERIALIZED (
      SELECT q.query_id, q.q_vec, en.entry_id AS cand_id,
             {_gcos('q.q_vec', 'ev.v')} AS sim
      FROM q JOIN entry en USING (centroid_id)
             JOIN e ev ON ev.vec_id = en.entry_id
    ),
    f1 AS MATERIALIZED (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY sim DESC, cand_id) AS rn
        FROM v0
      ) WHERE rn <= 8
    ),
    v1 AS MATERIALIZED (
      SELECT query_id, q_vec, cand_id, sim FROM v0
      UNION
      SELECT q.query_id, q.q_vec, ed.dst AS cand_id,
             {_gcos('q.q_vec', 'ev.v')} AS sim
      FROM f1 JOIN edges ed ON ed.src = f1.cand_id
              JOIN q ON q.query_id = f1.query_id
              JOIN e ev ON ev.vec_id = ed.dst
    ),
    f2 AS MATERIALIZED (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY sim DESC, cand_id) AS rn
        FROM v1
      ) WHERE rn <= 8
    ),
    v2 AS MATERIALIZED (
      SELECT query_id, q_vec, cand_id, sim FROM v1
      UNION
      SELECT q.query_id, q.q_vec, ed.dst AS cand_id,
             {_gcos('q.q_vec', 'ev.v')} AS sim
      FROM f2 JOIN edges ed ON ed.src = f2.cand_id
              JOIN q ON q.query_id = f2.query_id
              JOIN e ev ON ev.vec_id = ed.dst
    )
    SELECT query_id, cand_id, sim, rank FROM (
      SELECT query_id, cand_id, sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY sim DESC, cand_id) AS BIGINT) AS rank
      FROM v2 WHERE query_id != cand_id
    ) WHERE rank <= 3
    ORDER BY query_id, rank
    """,
    survey="extension (similarity, graph tier — round-11 stretch): "
    "HNSW-style partition-LOCAL neighbor graph with a centroid router — "
    "per-IVF-cell degree-6 kNN graph (index build: one cell-keyed "
    "self-join + top-degree window, quadratic only within a cell, "
    "train-once), served by bounded beam search (fixed per-cell entry "
    "point, 2 rounds x beam 8 — at most 1+8*6*2=97 float scorings per "
    "query, every step an equi-join on node id).  Cost-recall frontier "
    "vs the ADC re-rank tier measured in BASELINE.md; the oracle "
    "unrolls the exact bounded search",
)
def graph_ann_ivf_beam_topk(spark, sf_dir) -> DataFrame:
    """Graph-ANN top-3 over the deterministic IVF layout (centroids =
    vec_id % 100 == 1, queries = % 100 == 0): build the cell-local
    neighbor graph, route each query to its home cell's entry point,
    beam-walk 2 rounds, exact-rank the visited set."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double(F.col("embedding")).alias("v")
    )
    centroids = emb.filter(F.col("vec_id") % 100 == 1)
    return (
        sim.ivf_graph_topk(
            emb, centroids, F.col("vec_id") % 100 == 0,
            k=3, beam=8, rounds=2, degree=6,
        )
        .orderBy("query_id", "rank")
    )
