"""Operator-level tests not expressible as oracle comparisons."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def test_hash_id_matches_duckdb(spark):
    """The md5-derived 60-bit id must be bit-equal across engines — it
    anchors every hash-based dedup/fingerprint oracle."""
    from energy_emissions_lakehouse_spark.operators.dedup import hash_id, hash_id_sql

    samples = ["", "a", "abc", "hello world", "ünïcode", "x" * 1000, "a b c"]
    sdf = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = {
        r["s"]: r["h"]
        for r in sdf.select("s", hash_id(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    for s in samples:
        want = con.execute(
            f"SELECT {hash_id_sql('?')}", [s]  # noqa: S608 - test literal
        ).fetchone()[0]
        assert got[s] == want, s


def test_shingles_edge_cases(spark):
    """<n tokens -> empty; order = first occurrence; duplicates dropped."""
    from energy_emissions_lakehouse_spark.operators.text import shingles, tokens

    rows = [
        ("", []),
        ("one", []),
        ("one two", []),
        ("one two three", ["one two three"]),
        ("a b c d", ["a b c", "b c d"]),
        ("a b a b a b", ["a b a", "b a b"]),  # distinct keeps first two
    ]
    df = spark.createDataFrame([(s,) for s, _ in rows], ["text"])
    out = df.select("text", shingles(tokens(F.col("text"))).alias("sh")).collect()
    got = {r["text"]: r["sh"] for r in out}
    for s, want in rows:
        assert got[s] == want, s


def test_prefix_filter_is_sound(spark):
    """Every pair with Jaccard >= t must appear among prefix candidates
    (the filter may over-generate, never under-generate)."""
    from energy_emissions_lakehouse_spark.operators.dedup import (
        doc_shingles,
        jaccard,
        prefix_candidate_pairs,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",  # near-dup of 0
        "a completely different document about spark engines",
        "the quick brown fox jumps over the lazy dog",  # exact dup of 0
        "spark engines process completely different document content",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    sh = doc_shingles(docs)
    t = 0.5
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("a_sh"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("b_sh"))
    truth = {
        (r["a_id"], r["b_id"])
        for r in a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("sim", jaccard(F.col("a_sh"), F.col("b_sh")))
        .filter(F.col("sim") >= t)
        .collect()
    }
    cands = {
        (r["a_id"], r["b_id"])
        for r in prefix_candidate_pairs(sh, t).collect()
    }
    assert truth, "test corpus must contain at least one qualifying pair"
    assert truth <= cands


def test_decode_image_is_stubbed():
    from energy_emissions_lakehouse_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_audit_no_nulls_raises(spark):
    from energy_emissions_lakehouse_spark.medallion.star import audit_no_nulls

    clean = spark.createDataFrame([(1, "a")], ["id", "v"])
    audit_no_nulls(clean)  # must not raise
    dirty = spark.createDataFrame([(1, "a"), (2, None)], ["id", "v"])
    with pytest.raises(ValueError, match="v"):
        audit_no_nulls(dirty)
    audit_no_nulls(dirty, allow={"v"})  # allowed nullable column


def test_streaming_jobs_run_incrementally(spark, sf_dir):
    """The streaming path must accept per-file incremental triggers (not
    just one mega-batch): cap files per trigger and confirm the final
    result still matches the batch analog."""
    from energy_emissions_lakehouse_spark.registry import get_query
    from energy_emissions_lakehouse_spark.streaming import jobs

    ev = jobs.read_events_stream(spark, sf_dir)
    got = jobs.run_to_table(jobs.hourly_tumbling(ev), mode="complete")
    want = get_query("events_hourly_tumbling").spark(spark, sf_dir)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_partitioned_gold_prunes_partitions(spark, sf_dir):
    """The year filter must reach the file index as a PartitionFilter
    (directory pruning), not just a data filter."""
    from energy_emissions_lakehouse_spark.registry import get_query

    df = get_query("partitioned_gold_prune_2024").spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the pruned scan must mention the year predicate inside PartitionFilters
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "year" in pf


def test_hll_sketch_estimates_within_5pct(spark, sf_dir):
    """The HLL sketch query now emits deterministic verdicts (exact count +
    within-bound boolean) so the driver can hash-match it. The per-group
    and merged-ALL verdicts must all be true, and the exact counts must
    match an independent distinct count."""
    from energy_emissions_lakehouse_spark.registry import all_specs
    from energy_emissions_lakehouse_spark.tables import t

    rows = {
        r["o_orderpriority"]: r
        for r in all_specs()["hll_sketch_distinct_custkeys"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert len(rows) >= 2 and "ALL" in rows
    for prio, r in rows.items():
        assert r["exact_distinct"] > 0
        assert r["approx_within_8pct"], prio
    global_exact = (
        t(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert rows["ALL"]["exact_distinct"] == global_exact


def test_theta_sketch_estimates_within_6pct(spark, sf_dir):
    """Theta sketch set algebra emits exact counts + within-6% verdicts;
    all four verdicts (1997, 1998, intersection, union) must hold and the
    exact counts must satisfy inclusion-exclusion."""
    from energy_emissions_lakehouse_spark.registry import all_specs

    r = (
        all_specs()["theta_sketch_repeat_customers"]
        .spark(spark, sf_dir)
        .collect()[0]
    )
    for k in ("exact_1997", "exact_1998", "exact_both", "exact_either"):
        assert r[k] > 0, r
    assert r["exact_either"] == r["exact_1997"] + r["exact_1998"] - r["exact_both"]
    for k in ("ok_1997", "ok_1998", "ok_both", "ok_either"):
        assert r[k], r


def test_quantile_sketch_within_rank_bound(spark, sf_dir):
    """approx_percentile guarantees RANK error (not value error): the query
    itself now computes, per group and percentile, the estimate's rank
    interval [count_lt, count_le] and verdicts that it intersects
    [(p-.011)n, (p+.011)n]. All verdicts must be true and group sizes must
    match DuckDB."""
    from energy_emissions_lakehouse_spark.registry import all_specs

    rows = (
        all_specs()["quantile_sketch_prices"].spark(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    exact = dict(
        con.execute(
            "SELECT o_orderpriority, COUNT(*) FROM orders GROUP BY o_orderpriority"
        ).fetchall()
    )
    assert {r["o_orderpriority"] for r in rows} == set(exact)
    for r in rows:
        assert r["n_orders"] == exact[r["o_orderpriority"]]
        for k in ("p25_ok", "p50_ok", "p75_ok", "p99_ok"):
            assert r[k], r


def test_kmeans_invariants(spark, sf_dir):
    """k clusters, all vectors assigned, inertia monotone non-increasing
    with more Lloyd iterations, fully deterministic across reruns."""
    from energy_emissions_lakehouse_spark.operators import similarity as sim
    from energy_emissions_lakehouse_spark.tables import t as load

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double(F.col("embedding")).alias("v")
    )
    n = emb.count()

    def run(iters):
        rows = sim.kmeans_lloyd(emb, k=8, iters=iters).collect()
        return (
            sum(r["n_members"] for r in rows),
            sum(r["inertia"] for r in rows),
            sorted((r["cluster_id"], r["n_members"]) for r in rows),
        )

    total1, inertia1, _ = run(1)
    total3, inertia3, detail3 = run(3)
    assert total1 == n and total3 == n
    assert len(detail3) <= 8
    assert inertia3 <= inertia1 + 1e-6
    # determinism: same call twice -> identical assignment detail
    assert detail3 == run(3)[2]


def test_observe_metrics_piggyback(spark, sf_dir):
    """df.observe() must deliver row-count/null-count metrics as a side
    channel of a real query — the zero-extra-pass way to collect DQ
    metrics on a 100 TB run (no second scan, no separate job)."""
    from pyspark.sql import Observation
    from energy_emissions_lakehouse_spark.tables import t as load

    orders = load(spark, sf_dir, "orders")
    obs = Observation("dq")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "null_custkeys"
        ),
    )
    n = observed.filter(F.col("o_totalprice") > 0).count()
    got = obs.get
    assert got["n_rows"] >= n
    assert got["null_custkeys"] == 0


def test_ann_recall_ladder(spark, sf_dir):
    """Approximate search must actually approximate: recall@3 vs the
    brute-force oracle must be positive, and probing more cells (nprobe=2)
    must not lose recall vs nprobe=1 — the knob moves the right way."""
    from energy_emissions_lakehouse_spark.registry import all_specs

    def topk(name):
        out = {}
        for r in all_specs()[name].spark(spark, sf_dir).collect():
            out.setdefault(r["query_id"], set()).add(r["cand_id"])
        return out

    truth = topk("cosine_topk_bruteforce")
    n1, n2 = topk("ivf_topk_nprobe1"), topk("ivf_topk_nprobe2")

    def recall(approx):
        hits = sum(len(truth[q] & approx.get(q, set())) for q in truth)
        total = sum(len(v) for v in approx.values()) or 1
        return hits / total

    r1, r2 = recall(n1), recall(n2)
    assert r2 >= r1, (r1, r2)
    assert r2 > 0.25, (r1, r2)

    # Multi-probe LSH must beat round 1's single-probe bucket search and
    # clear 0.5 (its top-3 hits inside the brute-force top-10).
    r_single = recall(topk("ann_bucketed_topk"))
    r_multi = recall(topk("ann_multiprobe_topk"))
    assert r_multi >= r_single, (r_single, r_multi)
    assert r_multi >= 0.5, r_multi


def test_compact_small_files(spark, sf_dir, tmp_path):
    """Compaction must reduce file count to the target while preserving
    content exactly."""
    from energy_emissions_lakehouse_spark.sources.files import compact_small_files
    from energy_emissions_lakehouse_spark.tables import t as load

    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    orders = load(spark, sf_dir, "orders")
    orders.repartition(64).write.mode("overwrite").parquet(src)
    import glob

    assert len(glob.glob(src + "/part-*.parquet")) == 64
    compact_small_files(spark, src, dst, target_files=2)
    assert len(glob.glob(dst + "/part-*.parquet")) <= 2
    back = spark.read.parquet(dst)
    assert back.count() == orders.count()
    assert back.exceptAll(orders).count() == 0


def test_sorted_write_tightens_rowgroup_stats(spark, sf_dir, tmp_path):
    """A sort-clustered write must produce files whose l_shipdate min/max
    ranges are (near-)disjoint — the footer-stats property that lets a
    time filter skip whole files; a hash-shuffled write makes every file
    span the full date range."""
    import glob

    import pyarrow.parquet as pq

    from energy_emissions_lakehouse_spark.sources.files import write_sorted_by
    from energy_emissions_lakehouse_spark.tables import t as load

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    clustered, shuffled = str(tmp_path / "byd"), str(tmp_path / "hash")
    write_sorted_by(li, clustered, ["l_shipdate"], n_files=4)
    li.repartition(4).write.mode("overwrite").parquet(shuffled)

    def spans(path):
        out = []
        for f in sorted(glob.glob(path + "/part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }["l_shipdate"]
            lo = min(
                md.row_group(g).column(idx).statistics.min
                for g in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(g).column(idx).statistics.max
                for g in range(md.num_row_groups)
            )
            out.append((lo, hi))
        return out

    c = sorted(spans(clustered))
    s = spans(shuffled)
    # clustered: each file's span must not contain the NEXT file's start
    # (disjoint up to the single boundary value range sampling allows)
    for (lo1, hi1), (lo2, hi2) in zip(c, c[1:]):
        assert hi1 <= lo2, (c,)
    # hash-shuffled: every file spans nearly the whole range — the
    # layout a filter cannot skip; clustered files each cover a sliver
    glo = min(min(x for x, _ in s), min(x for x, _ in c))
    ghi = max(max(y for _, y in s), max(y for _, y in c))
    full = (ghi - glo).total_seconds()
    for lo, hi in s:
        assert (hi - lo).total_seconds() > 0.9 * full, (s,)
    for lo, hi in c:
        assert (hi - lo).total_seconds() < 0.5 * full, (c,)


def test_partition_scoped_merge_preserves_untouched_partitions(
    spark, sf_dir, tmp_path
):
    """The scale contract of upsert_partition_scoped: a delta touching one
    partition must leave every other partition's FILES byte-identical
    (same names, sizes, mtimes) — proof the merge never rewrote them."""
    import os

    from energy_emissions_lakehouse_spark.operators.merge import (
        upsert,
        upsert_partition_scoped,
    )
    from energy_emissions_lakehouse_spark.tables import t

    path = str(tmp_path / "orders_by_year")
    orders = t(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("long")
    )
    orders.write.partitionBy("o_year").parquet(path)

    def snapshot() -> dict[str, list[tuple[str, int, float]]]:
        out = {}
        for d in os.listdir(path):
            if d.startswith("o_year="):
                full = os.path.join(path, d)
                out[d] = sorted(
                    (f, os.path.getsize(os.path.join(full, f)),
                     os.path.getmtime(os.path.join(full, f)))
                    for f in os.listdir(full)
                )
        return out

    before = snapshot()
    updates = (
        orders.filter(
            ((F.col("o_orderkey") % 10) == 0) & (F.col("o_year") == 1995)
        )
        .withColumn("o_totalprice", F.col("o_totalprice") * F.lit(1.1))
        .withColumn("o_orderstatus", F.lit("U"))
    )
    upsert_partition_scoped(
        spark, path, updates, keys=["o_orderkey"], partition_col="o_year"
    )
    after = snapshot()

    assert before.keys() == after.keys()
    for part in before:
        if part == "o_year=1995":
            assert before[part] != after[part], "touched partition not rewritten"
        else:
            assert before[part] == after[part], f"{part} was rewritten"

    # Content parity with the pure algebraic merge.
    merged = spark.read.parquet(path)
    expected = upsert(orders, updates.select(*orders.columns), ["o_orderkey"])
    got = sorted(map(tuple, merged.select(*orders.columns).collect()))
    want = sorted(map(tuple, expected.collect()))
    assert got == want


def test_upsert_dedupes_duplicate_source_keys(spark):
    """MERGE key-uniqueness: a source with duplicate keys must insert ONE
    row per key (smallest non-key tuple wins), and applying the same
    duplicated source twice must be idempotent."""
    from energy_emissions_lakehouse_spark.operators.merge import upsert

    target = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    dup_source = spark.createDataFrame(
        [(2, "z"), (2, "y"), (3, "c"), (3, "a")], ["k", "v"]
    )
    once = upsert(target, dup_source, ["k"])
    assert sorted(map(tuple, once.collect())) == [(1, "a"), (2, "y"), (3, "a")]
    twice = upsert(once, dup_source, ["k"])
    assert sorted(map(tuple, twice.collect())) == [(1, "a"), (2, "y"), (3, "a")]


def test_num_hyperplanes_scales_with_corpus():
    """H must grow with log2(N) so bucket occupancy stays ~constant —
    the fix for round 1's fixed-geometry LSH."""
    from energy_emissions_lakehouse_spark.operators.similarity import (
        num_hyperplanes_for,
    )

    assert num_hyperplanes_for(500, target_occupancy=16) == 5
    assert num_hyperplanes_for(2000, target_occupancy=16) == 7
    assert (
        num_hyperplanes_for(4000, target_occupancy=16)
        == num_hyperplanes_for(2000, target_occupancy=16) + 1
    )
    assert num_hyperplanes_for(10, target_occupancy=64) == 1


def test_scoped_merge_scan_uses_dynamic_partition_pruning(
    spark, sf_dir, tmp_path
):
    """The read-side contract of upsert_partition_scoped: the semi-join on
    the partition column must plan as dynamic partition pruning on the
    target scan — untouched partition directories are never read (the
    write-side counterpart is the byte-identical-files test above)."""
    from energy_emissions_lakehouse_spark.operators.merge import (
        scope_to_touched_partitions,
    )
    from energy_emissions_lakehouse_spark.tables import t

    path = str(tmp_path / "orders_by_year_dpp")
    orders = t(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("long")
    )
    orders.write.partitionBy("o_year").parquet(path)
    target = spark.read.parquet(path)
    updates = orders.filter(F.col("o_year") == 1995)

    scoped = scope_to_touched_partitions(target, updates, "o_year")
    scoped.collect()
    plan = scoped._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan[:2000]


def test_python_datasource_partitions_and_determinism(spark):
    """The Spark 4 Python DataSource must split generation into chunks
    (partition-parallel, like row groups) and re-reads must be identical
    (values derive from the global row id only)."""
    from energy_emissions_lakehouse_spark.sources.pydatasource import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    df = (
        spark.read.format("eel_synthetic")
        .option("n_rows", 1000)
        .option("rows_per_partition", 300)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4  # ceil(1000 / 300)
    assert df.count() == 1000
    a = df.agg(F.sum("row_id"), F.sum("quality_flag")).collect()[0]
    b = (
        spark.read.format("eel_synthetic")
        .option("n_rows", 1000)
        .option("rows_per_partition", 300)
        .load()
        .agg(F.sum("row_id"), F.sum("quality_flag")).collect()[0]
    )
    assert a == b
    assert a[0] == 1000 * 999 // 2


def test_pq_encode_covers_corpus_and_reduces_distortion(spark, sf_dir):
    """PQ invariants: every vector gets exactly one code per subspace, and
    training (2 Lloyd iterations) must not increase total distortion vs
    the seed-only codebook (Lloyd's monotonicity, per subspace summed)."""
    from energy_emissions_lakehouse_spark.operators import similarity as sim
    from energy_emissions_lakehouse_spark.tables import t

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double(F.col("embedding")).alias("v")
    )
    n = emb.count()
    trained = sim.pq_encode(emb, m=4, ksub=16, iters=2)
    per_sub = {
        r["sub"]: r["cnt"]
        for r in trained.groupBy("sub").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    assert per_sub == {0: n, 1: n, 2: n, 3: n}
    d_trained = trained.agg(F.sum("d2")).collect()[0][0]
    d_seed = (
        sim.pq_encode(emb, m=4, ksub=16, iters=0)
        .agg(F.sum("d2")).collect()[0][0]
    )
    assert d_trained <= d_seed + 1e-9


def test_pq_adc_recall_ladder(spark, sf_dir):
    """ADC recall@3 vs exact L2 must climb as PQ geometry refines
    (m=4x16 -> m=16x32), and the registered geometry must clear a recall
    floor — the quality knob moves the right way, same contract as the
    IVF nprobe ladder."""
    import numpy as np

    from energy_emissions_lakehouse_spark.operators import similarity as sim
    from energy_emissions_lakehouse_spark.tables import t

    pdf = t(spark, sf_dir, "embeddings").select("vec_id", "embedding").toPandas()
    V = np.array([np.array(v, dtype=np.float64) for v in pdf["embedding"]])
    ids = pdf["vec_id"].to_numpy()
    exact = {}
    for qi in np.where(ids % 100 == 0)[0]:
        d = ((V - V[qi]) ** 2).sum(axis=1)
        order = sorted(range(len(ids)), key=lambda j: (d[j], ids[j]))
        exact[ids[qi]] = set(
            [ids[j] for j in order if ids[j] != ids[qi]][:3]
        )

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double(F.col("embedding")).alias("v")
    )

    def recall(m, ksub):
        adc = sim.pq_adc_topk(
            emb, query_pred=F.col("vec_id") % 100 == 0, k=3, m=m, ksub=ksub,
            iters=2,
        ).toPandas()
        per_q = [
            len(set(g["cand_id"]) & exact[q]) / 3
            for q, g in adc.groupby("query_id")
        ]
        return sum(per_q) / len(per_q)

    coarse, fine = recall(4, 16), recall(16, 32)
    assert fine > coarse, (coarse, fine)
    # The absolute floor is corpus-size-calibrated: fixed m=16x32 geometry
    # degrades as distractors grow (BASELINE.md "PQ/ADC recall AT SCALE":
    # 0.467 @ sf0.001, 0.33 @ N=2000/sf0.1 — the shortlist knob is the
    # restore path). Assert it only inside the calibrated range; the
    # monotonicity assert above is the SF-independent contract.
    if len(ids) <= 1000:
        assert fine >= 0.4, fine


def test_pq_incremental_assign_is_exact_and_batch_only(spark, sf_dir):
    """Incremental PQ index maintenance must be EXACT: (a) the frozen-
    codebook encode reproduces the codes a full rebuild assigns to the
    batch (n_code_drift identically 0), (b) cell counts are consistent
    and cover the whole corpus (m rows per vector), and (c) ADC serving
    over the merged (history + incrementally-encoded batch) index is
    row-identical to serving over the staged full index — recall is
    unchanged by construction, not within a tolerance."""
    from energy_emissions_lakehouse_spark.operators import similarity as sim
    from energy_emissions_lakehouse_spark.queries.vectors import (
        _pq_staged_model,
        pq_incremental_assign,
    )
    from energy_emissions_lakehouse_spark.tables import t

    out = pq_incremental_assign(spark, sf_dir).collect()
    assert len(out) > 0
    assert sum(r["n_code_drift"] for r in out) == 0
    assert all(r["n_history"] + r["n_batch"] == r["n_merged"] for r in out)
    n_vecs = t(spark, sf_dir, "embeddings").count()
    assert sum(r["n_merged"] for r in out) == 16 * n_vecs
    assert sum(r["n_batch"] for r in out) > 0  # the batch is non-empty

    encoded, codebooks = _pq_staged_model(
        spark, sf_dir, m=16, ksub=32, iters=2
    )
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double(F.col("embedding")).alias("v")
    )
    is_batch = F.col("vec_id") % 10 == 0
    merged = encoded.filter(~is_batch).unionByName(
        sim.pq_encode_frozen(emb.filter(is_batch), codebooks, m=16)
    )

    def serve(model):
        return sorted(
            tuple(r)
            for r in sim.pq_adc_topk(
                emb,
                query_pred=F.col("vec_id") % 100 == 0,
                k=3,
                m=16,
                ksub=32,
                iters=2,
                model=model,
            ).collect()
        )

    assert serve((merged, codebooks)) == serve((encoded, codebooks))


def test_bm25_results_contain_query_terms_and_rank_sanely(spark, sf_dir):
    """Every returned doc must contain >=1 query term; scores must be
    positive and non-increasing down the ranking."""
    from energy_emissions_lakehouse_spark.queries.retrieval import (
        QUERY_TERMS,
        bm25_keyword_topk,
    )
    from energy_emissions_lakehouse_spark.tables import t

    top = bm25_keyword_topk(spark, sf_dir).collect()
    assert 0 < len(top) <= 20
    scores = [r["score_micro"] for r in top]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    docs = {
        r["doc_id"]: r["text"].lower()
        for r in t(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin([r["doc_id"] for r in top]))
        .collect()
    }
    for r in top:
        assert any(q in docs[r["doc_id"]] for q in QUERY_TERMS), r["doc_id"]


def test_bpe_merges_are_valid_and_weighted(spark, sf_dir):
    """Each learned merge must (a) concatenate its two sides, (b) carry a
    positive weighted count, and (c) never repeat an earlier merge (the
    merged symbol replaces the pair, so its count drops after merging)."""
    from energy_emissions_lakehouse_spark.queries.retrieval import (
        bpe_train_merges,
    )

    rows = bpe_train_merges(spark, sf_dir).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3]
    seen = set()
    for r in rows:
        assert r["merged"] == r["left_sym"] + r["right_sym"]
        assert r["pair_count"] > 0
        assert (r["left_sym"], r["right_sym"]) not in seen
        seen.add((r["left_sym"], r["right_sym"]))


def test_anomaly_zscore_flags_injected_spike(spark):
    """A flat hourly series with one 10x spike must flag exactly the spike
    hour (after the 12-hour warm-up), and a flat series must flag nothing."""
    import datetime as dt

    from energy_emissions_lakehouse_spark.queries import events as ev_q

    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(48):
        v = 1000.0 if h == 40 else 100.0  # 10x spike at hour 40
        rows.append((h, base + dt.timedelta(hours=h, minutes=5), 1, "click", v, "{}"))
        rows.append((h + 100, base + dt.timedelta(hours=h, minutes=10), 2, "view", 100.0, "{}"))
    import os
    import tempfile

    import pandas as pd

    # single-file parquet, like the driver testdata (tables.t probes the
    # footer with pyarrow and expects a file, not a spark directory)
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    d = tempfile.mkdtemp(prefix="anom")
    pdf.to_parquet(os.path.join(d, "events.parquet"))
    # reuse the registered query body against the synthetic dir
    out = ev_q.events_hourly_anomaly_zscore(spark, d).collect()
    flagged = {(r["event_type"], r["hour_ts"].hour + 24 * (r["hour_ts"].day - 1)) for r in out}
    assert ("click", 40) in flagged, out
    assert all(t == "click" for t, _ in flagged), out


def test_pagerank_conserves_mass_within_floor_leak(spark, sf_dir):
    """Integer PageRank floors every division, so total rank can only
    leak DOWNWARD, bounded by (edges + nodes + 1) nano per step plus the
    damped share of dangling-node mass. Pin: ranks positive, total <=
    BASE, total >= BASE - loose bound, and top nation deterministic."""
    from energy_emissions_lakehouse_spark.queries.graph import (
        PR_BASE,
        pagerank_nation_trade,
    )

    rows = pagerank_nation_trade(spark, sf_dir).collect()
    assert len(rows) == 25
    assert all(r["rank_nano"] > 0 for r in rows)
    total = sum(r["rank_nano"] for r in rows)
    assert total <= PR_BASE
    # dangling nations (no outgoing trade) would drop up to 85% of their
    # mass per step; with all 25 nations trading, leak is floor-only, but
    # keep the bound loose enough to survive sparse testdata variants
    assert total >= PR_BASE - 100_000, total
    ranks = [r["rank_nano"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_connected_components_contract(spark):
    """Pins the operator contract directly: correct min-labels on a path
    graph, max_iter=1 SUCCEEDS on an already-converged input (the fused
    init/round-1 must not skip straight to the no-fixpoint raise — round-6
    review finding), and a genuinely unconverged budget raises."""
    import pytest as _pytest

    from energy_emissions_lakehouse_spark.operators.dedup import (
        connected_components,
    )

    # two components: path 1-2-3-4 and edge 10-11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "a_id long, b_id long"
    )
    out = {
        r["node"]: r["component_id"]
        for r in connected_components(edges).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    # already-converged after the fused round: every node's min neighbor
    # is its own label source... an edgeless symmetric self-pair graph
    conv = spark.createDataFrame([(5, 5)], "a_id long, b_id long")
    out1 = {
        r["node"]: r["component_id"]
        for r in connected_components(conv, max_iter=1).collect()
    }
    assert out1 == {5: 5}

    # a 4-path needs 2+ propagation rounds; max_iter=1 must raise, not
    # silently return unconverged labels
    with _pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(edges, max_iter=1)
