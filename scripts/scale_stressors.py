#!/usr/bin/env python
"""Measured scale stressors (round-9 items 4+5, round-10 item 5): numbers, not
prose, for the three 100 TB claims that previously rested on unmeasured
assumptions.

A. SKEW  — salted_join (operators/skew.py) vs the plain shuffle join on
   a pathological key distribution: lineitem inflated 10x (~6M rows at
   sf0.1) with 50% of all rows on ONE join key, followed by a
   groupBy(join key) — the exact downstream shape that SUPPRESSES AQE's
   skew-join split (the split would break the required hash
   distribution; pinned in tests/test_plan_quality.py), i.e. the case
   where manual salting is the only mitigation.

B. BLOOM — the per-segment bloom sidecar build at 1x vs 10x the file
   count (same total rows), plus the point-lookup prune fraction and
   serving wall at both layouts: the build must scale with DATA (fixed
   per-file overhead amortized), the lookup must stay flat because
   pruning gets MORE selective with more, smaller files.

C. VREAD — the versioned-table read path vs spark.read.parquet on the
   SAME bytes: the no-DV fast path (must be ~1x — it compiles to the
   identical JVM parquet scan plus an O(files) log fold) and the
   DV-masked read after a 1% merge-on-read delete (broadcast anti-join
   overhead).

E. XSUB  — exact-substring dedup growth (round-10 verdict item 5):
   window rows / duplicated windows / wall at sf0.01 vs the bench SF
   must grow near-linearly (no all-pairs step anywhere).

F. DEEP  — 10k-commit history (round-10 item 5): snapshot resolution,
   stats fold and checkpoint-fold cost must stay O(tail), not
   O(history), via the incremental checkpoint.

Writes SCALE_STRESSORS_r11.json at the repo root and prints it.
Run on an IDLE host (same policy as bench.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import functions as F

from energy_emissions_lakehouse_spark.fsutil import user_staging_root
from energy_emissions_lakehouse_spark.operators.skew import salted_join
from energy_emissions_lakehouse_spark.operators.vtable import VersionedTable
from energy_emissions_lakehouse_spark.session import get_spark
from energy_emissions_lakehouse_spark.tables import t as load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32") or "32")
REPS = 3


def best_of(fn, reps=REPS) -> float:
    """Median wall over reps (same policy as bench.py)."""
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(sorted(runs)[len(runs) // 2], 3)


def main() -> None:
    spark = get_spark(app_name="eel-stressors", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    work = os.path.join(user_staging_root(), "stressors_r10")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    out: dict = {"sf_dir": SF_DIR, "cpus": CPUS, "reps": REPS}

    # ---------------------------------------------------------- A. skew
    li = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    n_keys = 100_000
    fact = (
        li.crossJoin(
            spark.range(20).select(F.col("id").alias("rep"))  # 20x inflate
        )
        .withColumn(
            "h", F.xxhash64("l_orderkey", "l_partkey", "rep")
        )
        .select(
            # 50% of ALL rows land on key 1; the rest spread uniformly
            F.when(F.pmod(F.col("h"), F.lit(2)) == 0, F.lit(1))
            .otherwise(F.pmod(F.col("h"), F.lit(n_keys)))
            .cast("bigint")
            .alias("k"),
            F.col("l_extendedprice").alias("amount"),
        )
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") % 97 + 1).alias("weight")
    )
    fact_pq = os.path.join(work, "skew_fact")
    dim_pq = os.path.join(work, "skew_dim")
    fact.write.parquet(fact_pq)
    dim.write.parquet(dim_pq)
    factr = spark.read.parquet(fact_pq)
    dimr = spark.read.parquet(dim_pq)
    n_fact = factr.count()
    hot = factr.where("k = 1").count()

    def agg_of(joined):
        return (
            joined.groupBy("k")
            .agg(F.sum(F.col("amount") * F.col("weight")).alias("s"))
            .agg(
                F.count(F.lit(1)).alias("groups"),
                F.sum("s").alias("total"),
            )
            .collect()[0]
        )

    plain_res = agg_of(factr.join(dimr, "k"))
    salted_res = agg_of(salted_join(factr, dimr, ["k"], num_salts=32))
    assert plain_res == salted_res, (plain_res, salted_res)  # row-identical
    # Regime 1 — dim BROADCASTS (it fits): no shuffle, no skew problem;
    # salting is pure overhead here.  Measured to document WHEN NOT to
    # salt: a broadcastable dim always beats the salt rewrite.
    bcast_s = best_of(lambda: agg_of(factr.join(dimr, "k")))
    salted_bcast_s = best_of(
        lambda: agg_of(salted_join(factr, dimr, ["k"], num_salts=32))
    )
    # Regime 2 — the dim CANNOT broadcast (the 100 TB case salting is
    # for: a dimension too big for executor memory forces a shuffle
    # join, and the hot key becomes one straggler task).  Simulated by
    # disabling auto-broadcast, which is exactly what a >threshold dim
    # does; the downstream groupBy(k) suppresses AQE's skew split (the
    # split would break the required hash distribution — pinned in
    # tests/test_plan_quality.py), so salting is the only mitigation.
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        shuffle_s = best_of(lambda: agg_of(factr.join(dimr, "k")))
        salted_shuffle_s = best_of(
            lambda: agg_of(salted_join(factr, dimr, ["k"], num_salts=32))
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    # Shuffle BALANCE — the metric that IS wall-clock at cluster scale:
    # on 1000 executors the join stage finishes when its LARGEST shuffle
    # partition does, and local[32] wall hides that (31 idle-ish cores
    # absorb the straggler).  Measure max/mean rows per shuffle
    # partition for the unsalted vs salted key distribution directly.
    n_part = 32
    from pyspark.sql.functions import spark_partition_id

    def balance(df, *cols):
        sizes = [
            r.n
            for r in df.repartition(n_part, *cols)
            .groupBy(spark_partition_id().alias("p"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        return max(sizes), round(max(sizes) * len(sizes) / sum(sizes), 2)

    plain_max, plain_ratio = balance(factr, "k")
    from energy_emissions_lakehouse_spark.operators.skew import SALT_COL

    salted_fact = factr.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in factr.columns]), F.lit(32)),
    )
    salt_max, salt_ratio = balance(salted_fact, "k", SALT_COL)
    out["skew_join"] = {
        "rows": n_fact,
        "hot_key_rows": hot,
        "hot_fraction": round(hot / n_fact, 4),
        "n_salts": 32,
        "shuffle_balance": {
            "partitions": n_part,
            "plain_max_partition_rows": plain_max,
            "plain_max_over_mean": plain_ratio,
            "salted_max_partition_rows": salt_max,
            "salted_max_over_mean": salt_ratio,
        },
        "broadcastable_dim": {
            "plain_sec": bcast_s,
            "salted_sec": salted_bcast_s,
            "verdict": "broadcast wins; do not salt a broadcastable join",
        },
        "shuffle_forced": {
            "plain_sec": shuffle_s,
            "salted_sec": salted_shuffle_s,
            "speedup": round(shuffle_s / salted_shuffle_s, 2),
        },
    }
    print(f"[stress] skew: {out['skew_join']}", file=sys.stderr)

    # --------------------------------------------------------- B. bloom
    li_b = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    probe_key = int(
        li_b.select("l_orderkey").orderBy("l_orderkey").limit(1).collect()[0][0]
    )
    bloom_rec = {}
    for tag, n_segs in (("x1", 6), ("x10", 60)):
        root = os.path.join(work, f"bloom_{tag}")
        sliced = li_b.withColumn(
            "b", F.pmod(F.xxhash64("l_orderkey", "l_partkey"), F.lit(n_segs))
        ).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        vt = VersionedTable.create(
            spark,
            root,
            sliced.where(F.col("b") == 0).drop("b"),
            bloom_cols=["l_orderkey"],
        )
        for i in range(1, n_segs):
            vt.append(sliced.where(F.col("b") == i).drop("b"))
        build_s = round(time.perf_counter() - t0, 3)
        sliced.unpersist()
        head = vt.latest_version()
        scanned, skipped = vt.prune_point(head, "l_orderkey", probe_key)
        lookup_s = best_of(
            lambda vt=vt: vt.read_point("l_orderkey", probe_key)
            .where(F.col("l_orderkey") == probe_key)
            .count()
        )
        bloom_rec[tag] = {
            "segments": n_segs,
            "build_sec_total": build_s,
            "build_sec_per_segment": round(build_s / n_segs, 3),
            "point_scanned": len(scanned),
            "point_skipped": len(skipped),
            "prune_fraction": round(len(skipped) / n_segs, 3),
            "point_lookup_sec": lookup_s,
        }
        print(f"[stress] bloom {tag}: {bloom_rec[tag]}", file=sys.stderr)
    out["bloom_10x_files"] = bloom_rec

    # --------------------------------------------------------- C. vread
    root = os.path.join(work, "vread")
    li_c = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice"
    )
    vt = VersionedTable.create(spark, root, li_c)
    seg_dir = os.path.join(
        root, sorted(vt._resolve_live(vt.latest_version()))[0]
    )

    def scan_agg(df):
        return (
            df.groupBy("l_returnflag")
            .agg(
                F.sum("l_quantity").alias("q"),
                F.sum("l_extendedprice").alias("p"),
            )
            .collect()
        )

    plain_scan = best_of(lambda: scan_agg(spark.read.parquet(seg_dir)))
    vt_scan = best_of(lambda: scan_agg(vt.read()))
    vt.delete_where_mor("pmod(xxhash64(l_orderkey, l_quantity), 100) = 0")
    dv_scan = best_of(lambda: scan_agg(vt.read()))
    out["vtable_read_overhead"] = {
        "rows": li_c.count(),
        "plain_parquet_sec": plain_scan,
        "vtable_nodv_sec": vt_scan,
        "nodv_overhead_x": round(vt_scan / plain_scan, 2),
        "vtable_dv_masked_sec": dv_scan,
        "dv_overhead_x": round(dv_scan / plain_scan, 2),
    }
    print(f"[stress] vread: {out['vtable_read_overhead']}", file=sys.stderr)

    # rename-read overhead (round-9 DDL): the coalesce-over-chain scan a
    # RENAMED table pays versus the plain vtable read of the SAME bytes —
    # rename l_quantity, append a slice under the new name, re-run the
    # identical aggregate through the chain projection
    vt.rename_column("l_quantity", "qty")
    vt.append(
        li_c.limit(10_000).withColumnRenamed("l_quantity", "qty")
    )

    def scan_agg_renamed(df):
        return (
            df.groupBy("l_returnflag")
            .agg(
                F.sum("qty").alias("q"),
                F.sum("l_extendedprice").alias("p"),
            )
            .collect()
        )

    renamed_scan = best_of(lambda: scan_agg_renamed(vt.read()))
    out["vtable_read_overhead"]["renamed_chain_sec"] = renamed_scan
    # the honest baseline is the DV-MASKED read the rename rides on (the
    # MOR delete above predates the rename); vs plain parquet the ratio
    # mostly re-measures the DV anti-join
    out["vtable_read_overhead"]["renamed_vs_dv_x"] = round(
        renamed_scan / dv_scan, 2
    )
    print(
        f"[stress] vread renamed: {renamed_scan}s "
        f"({out['vtable_read_overhead']['renamed_vs_dv_x']}x the DV-masked "
        "read it rides on)",
        file=sys.stderr,
    )

    # ------------------------------------- D. interval-overlap candidates
    # The round-9 interval_overlap_sessions claim: candidate generation is
    # OUTPUT-proportional (equi-join on covered hour buckets), never the
    # sessions² a naive inequality join examines.  True overlap pairs are
    # inherently quadratic in temporal density — so the honest measurement
    # inflates CONCURRENCY (N user-shifted copies of the same events: N×
    # sessions, ~N²× true pairs) and tracks candidates/naive (must FALL or
    # stay tiny) and candidates/true-pair (must stay bounded — the
    # verify-filter workload per emitted result).
    from energy_emissions_lakehouse_spark.queries.scale_joins import (
        OVERLAP_BUCKET_S,
        OVERLAP_GAP_MIN,
        interval_overlap_sessions,
    )

    import duckdb as _duck

    iv_out: dict = {}
    for n in (1, 2, 4):
        dir_n = os.path.join(work, f"iv{n}")
        os.makedirs(dir_n, exist_ok=True)
        # single-FILE parquet (tables.t's footer probe expects a file,
        # like the generated testdata) — DuckDB COPY, not a Spark write
        parts = " UNION ALL ".join(
            f"SELECT user_id + {i * 10_000_000} AS user_id, ts FROM src"
            for i in range(n)
        )
        _duck.connect().execute(f"""
            COPY (
              WITH src AS (SELECT user_id, ts
                           FROM read_parquet('{SF_DIR}/events.parquet')),
              u AS ({parts})
              SELECT ROW_NUMBER() OVER () AS event_id, ts, user_id,
                     'click' AS event_type, CAST(0.0 AS DOUBLE) AS value,
                     '{{}}' AS props
              FROM u
            ) TO '{os.path.join(dir_n, "events.parquet")}'
            (FORMAT PARQUET)
        """)
        # session intervals (same derivation as the query) -> bucket census
        from pyspark.sql import Window as W

        evn = load(spark, dir_n, "events").select("user_id", "ts")
        wl = W.partitionBy("user_id").orderBy("ts")
        gap = F.timestamp_diff("MICROSECOND", F.lag("ts").over(wl), F.col("ts"))
        brk = F.when(
            gap.isNull() | (gap > OVERLAP_GAP_MIN * 60 * 1_000_000), 1
        ).otherwise(0)
        iv = (
            evn.select("user_id", "ts", F.sum(brk).over(
                wl.rowsBetween(W.unboundedPreceding, W.currentRow)
            ).alias("sid"))
            .groupBy("user_id", "sid")
            .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
        )
        expl = iv.select(F.explode(F.sequence(
            (F.unix_timestamp("t0") / OVERLAP_BUCKET_S).cast("long"),
            (F.unix_timestamp("t1") / OVERLAP_BUCKET_S).cast("long"),
        )).alias("bucket"))
        census = expl.groupBy("bucket").count()
        cand = census.agg(
            F.sum(F.col("count") * F.col("count")).alias("c")
        ).collect()[0]["c"]
        n_sessions = iv.count()
        true_pairs = (
            interval_overlap_sessions(spark, dir_n)
            .agg(F.sum("n_overlap_pairs").alias("p"))
            .collect()[0]["p"]
        )
        naive = n_sessions * (n_sessions - 1) // 2
        iv_out[f"{n}x"] = {
            "sessions": n_sessions,
            "naive_pairs": naive,
            "bucket_candidates": int(cand),
            "true_pairs": int(true_pairs),
            "candidates_vs_naive": round(cand / naive, 6),
            "candidates_per_true_pair": round(cand / max(true_pairs, 1), 1),
        }
        print(f"[stress] interval {n}x: {iv_out[f'{n}x']}", file=sys.stderr)
    out["interval_overlap_candidates"] = iv_out

    # --------------------------------- E. exact-substring dedup growth
    # Round-10 verdict item 5: the Lee-et-al exact-substring tier must
    # grow near-linearly with corpus size — window rows are O(tokens),
    # the only shuffle is the window-hash groupBy + keyed join back, and
    # there is no all-pairs step whose cost would grow quadratically.
    from energy_emissions_lakehouse_spark.operators.dedup import (
        exact_substring_coverage,
        exact_substring_windows,
    )
    from energy_emissions_lakehouse_spark.queries.text import _xs_docs

    xs_out = {}
    sweep = [os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01")]
    if os.path.realpath(sweep[0]) != os.path.realpath(SF_DIR):
        sweep.append(SF_DIR)
    for d in [p for p in sweep if os.path.isdir(p)]:
        docs = _xs_docs(spark, d).select(
            "doc_id", F.split(F.lower("text"), r"\W+").alias("toks")
        )
        n_docs = docs.count()
        win = exact_substring_windows(docs, w=20)
        n_windows = win.count()
        dup_w = (
            win.groupBy("hid")
            .agg(F.count(F.lit(1)).alias("n"))
            .where("n >= 2")
            .agg(F.sum("n"))
            .collect()[0][0]
            or 0
        )
        wall = best_of(
            lambda: exact_substring_coverage(docs, w=20).collect()
        )
        tag = os.path.basename(d.rstrip("/"))
        xs_out[tag] = {
            "docs": n_docs,
            "window_rows": int(n_windows),
            "dup_window_rows": int(dup_w),
            "wall_sec": round(wall, 3),
            "windows_per_doc": round(n_windows / max(n_docs, 1), 1),
        }
        print(f"[stress] exact-substring {tag}: {xs_out[tag]}",
              file=sys.stderr)
    # Third decade (round-10 verdict item 6): inflate the bench-SF
    # corpus 10x by disjoint replication — every token is suffixed with
    # its replica id, so each replica is content-disjoint (the intra-
    # corpus duplication RATIO stays constant while volume grows 10x;
    # plain replication would instead make every window a 10-way dup
    # and change the workload shape).  Near-linear wall growth across
    # THREE decades is the no-all-pairs proof.
    docs10 = (
        _xs_docs(spark, SF_DIR)
        .crossJoin(spark.range(10).select(F.col("id").alias("_rep")))
        .select(
            (F.col("doc_id") * 10 + F.col("_rep")).alias("doc_id"),
            F.expr(
                "transform(split(lower(text), '\\\\W+'), "
                "t -> concat(t, '_', cast(_rep as string)))"
            ).alias("toks"),
        )
        .localCheckpoint(eager=True)
    )
    n10 = docs10.count()
    win10 = exact_substring_windows(docs10, w=20)
    wall10 = best_of(lambda: exact_substring_coverage(docs10, w=20).collect())
    xs_out["x10_synth"] = {
        "docs": int(n10),
        "window_rows": int(win10.count()),
        "wall_sec": round(wall10, 3),
    }
    print(f"[stress] exact-substring x10_synth: {xs_out['x10_synth']}",
          file=sys.stderr)
    docs10.unpersist()

    # Memo-cold rebuild (the per-corpus-version _XS_WIN_MEMO stage): the
    # one-time cost a regenerated corpus pays before the first
    # exact-substring query serves warm.
    from energy_emissions_lakehouse_spark.queries import text as qtext

    qtext._XS_WIN_MEMO.clear()
    t0 = time.perf_counter()
    qtext._xs_windows(spark, SF_DIR)
    xs_out["memo_rebuild_cold_sec"] = round(time.perf_counter() - t0, 3)
    print(
        f"[stress] xs memo cold rebuild: {xs_out['memo_rebuild_cold_sec']}s",
        file=sys.stderr,
    )

    sf_keys = sorted(k for k in xs_out if k.startswith("sf"))
    if len(sf_keys) == 2:
        a, b = (xs_out[k] for k in sf_keys)
        xs_out["growth"] = {
            "docs_ratio": round(b["docs"] / a["docs"], 2),
            "window_ratio": round(b["window_rows"] / a["window_rows"], 2),
            "wall_ratio": round(b["wall_sec"] / max(a["wall_sec"], 1e-9), 2),
        }
        xs_out["growth_decade2"] = {
            "docs_ratio": round(xs_out["x10_synth"]["docs"] / b["docs"], 2),
            "window_ratio": round(
                xs_out["x10_synth"]["window_rows"] / b["window_rows"], 2
            ),
            "wall_ratio": round(
                xs_out["x10_synth"]["wall_sec"]
                / max(b["wall_sec"], 1e-9),
                2,
            ),
        }
    out["exact_substring_growth"] = xs_out

    # ------------------------------------------ F. deep commit history
    # Round-10 verdict item 5: a 10k-commit table's snapshot resolution
    # and checkpoint-fold cost must stay bounded (O(tail) via the
    # incremental checkpoint, round-11 fix: the checkpoint writer used
    # to run THREE genesis walks — 430 ms/checkpoint at 5k commits).
    # Commits are fabricated driver-side (copytree of one real segment,
    # then the real _commit protocol) so 10k commits take ~2 min, the
    # log shape being exactly what a drip-feed streaming sink produces.
    import uuid as _uuid

    from energy_emissions_lakehouse_spark.operators.vtable import (
        DATA_DIR, _fmt_version,
    )

    droot = os.path.join(work, "deep")
    ddf = spark.range(0, 100).select(
        F.col("id").cast("int").alias("k"), (F.col("id") * 2.0).alias("p")
    )
    dvt = VersionedTable.create(spark, droot, ddf)
    seed_rel = sorted(dvt._resolve_live(0))[0]
    n_deep = int(os.environ.get("SPARK_GRAFT_DEEP_COMMITS", "10000"))
    ckpt_ms: list[float] = []
    t0 = time.perf_counter()
    for v in range(1, n_deep + 1):
        rel = os.path.join(
            DATA_DIR, f"{_fmt_version(v)}-{_uuid.uuid4().hex[:8]}"
        )
        shutil.copytree(
            os.path.join(droot, seed_rel), os.path.join(droot, rel)
        )
        tc = time.perf_counter()
        dvt._commit(v, "append", add=[rel], remove=[], schema=ddf.schema)
        if v % 8 == 0:
            ckpt_ms.append((time.perf_counter() - tc) * 1000)
    build_s = round(time.perf_counter() - t0, 1)
    fresh = VersionedTable(spark, droot)
    step = max(len(ckpt_ms) // 10, 1)
    out["deep_history"] = {
        "commits": n_deep,
        "build_sec_total": build_s,
        "snapshot_resolution_ms": round(
            best_of(lambda: fresh._snapshot(None)) * 1000, 1
        ),
        "live_stats_fold_ms": round(
            best_of(lambda: fresh._live_segment_stats(n_deep)) * 1000, 1
        ),
        "time_travel_mid_ms": round(
            best_of(lambda: fresh._snapshot(n_deep // 2)) * 1000, 1
        ),
        "checkpoint_commit_ms_first_last": [
            round(ckpt_ms[0], 1), round(ckpt_ms[-1], 1)
        ],
        # round-12 (verdict item 2): the FULL sweep, decile-sampled —
        # boundedness must be visible in the payload, not narrated.
        # Sidecar checkpoints rewrite only the tail-touched sidecar(s),
        # so this curve must be flat-ish (r11 inline form: 6.5 -> 217).
        "checkpoint_commit_ms_deciles": [
            round(ckpt_ms[i], 1) for i in range(0, len(ckpt_ms), step)
        ],
    }
    print(f"[stress] deep history: {out['deep_history']}", file=sys.stderr)

    # ------------------------------------- G. ANN corpus growth (r12)
    # Round-11 verdict item 7: the ANN tier's occupancy-constant claim
    # (H sized by num_hyperplanes_for) measured, not argued — scored
    # candidates per query and recall@3 must stay stable across a 10x
    # synthetic corpus growth.
    from energy_emissions_lakehouse_spark.operators import similarity as sim

    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    n1 = emb.count()
    # 10x corpus: 9 deterministic perturbed replicas (component-wise
    # hash-noise, +-5% of the component scale) so bucket geometry sees
    # new, realistically-clustered vectors, not exact duplicates
    reps = (
        emb.crossJoin(spark.range(1, 10).select(F.col("id").alias("rep")))
        .select(
            (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> cast(x + "
                "((pmod(xxhash64(vec_id, rep, i), 1000) - 500) / 10000.0)"
                " as float))"
            ).alias("embedding"),
        )
    )
    emb10 = emb.select("vec_id", "embedding").unionByName(reps)
    emb10 = emb10.localCheckpoint(eager=True)
    n10 = emb10.count()
    q_ids = [r.vec_id for r in emb.select("vec_id").orderBy("vec_id").limit(50).collect()]
    ann_out: dict = {}
    for tag, corpus, n in (("x1", emb, n1), ("x10", emb10, n10)):
        h = sim.num_hyperplanes_for(n)
        queries = corpus.filter(F.col("vec_id").isin(q_ids))
        t0 = time.perf_counter()
        scored_n = sim.multiprobe_topk(
            queries, corpus, k=3, num_hyperplanes=h, return_scored=True
        ).count()
        wall = time.perf_counter() - t0
        approx = {
            (r.query_id, r.cand_id)
            for r in sim.multiprobe_topk(
                queries, corpus, k=3, num_hyperplanes=h
            ).collect()
        }
        exact = {
            (r.query_id, r.cand_id)
            for r in sim.brute_force_topk(queries, corpus, k=3).collect()
        }
        ann_out[tag] = {
            "n_vectors": n,
            "num_hyperplanes": h,
            "scored_candidates_per_query": round(scored_n / len(q_ids), 1),
            "recall_at_3": round(len(approx & exact) / max(len(exact), 1), 3),
            "wall_sec": round(wall, 3),
        }
        print(f"[stress] ann {tag}: {ann_out[tag]}", file=sys.stderr)
    ann_out["growth"] = {
        "corpus_ratio": round(n10 / n1, 2),
        "candidates_ratio": round(
            ann_out["x10"]["scored_candidates_per_query"]
            / max(ann_out["x1"]["scored_candidates_per_query"], 1e-9),
            2,
        ),
        "recall_delta": round(
            ann_out["x10"]["recall_at_3"] - ann_out["x1"]["recall_at_3"], 3
        ),
    }
    out["ann_corpus_growth"] = ann_out

    dest = os.path.join(_REPO_ROOT, "SCALE_STRESSORS_r12.json")
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
