"""Multi-batch Structured Streaming: state must merge across micro-batches.

The single-file availableNow runs in queries/streaming_queries.py process
everything in one batch; here the events table is staged as 4 time-ranged
files and streamed with ``maxFilesPerTrigger=1``, so the same jobs run as
4 micro-batches with watermark advancement and cross-batch state — and the
final result must STILL equal the batch answer.
"""

from __future__ import annotations

import os
import tempfile

import pytest

from energy_emissions_lakehouse_spark.streaming import jobs
from energy_emissions_lakehouse_spark.tables import t


@pytest.fixture(scope="module")
def staged_dir(spark, sf_dir) -> str:
    """events split into 4 time-ranged files of canonical (µs-ts) schema."""
    out = os.path.join(
        tempfile.gettempdir(), "eel_stream_multibatch", os.path.basename(sf_dir)
    )
    (
        t(spark, sf_dir, "events")
        .repartitionByRange(4, "ts")
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def _assert_same(got, want):
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_tumbling_aggregate_across_batches(spark, sf_dir, staged_dir):
    from energy_emissions_lakehouse_spark.registry import get_query

    ev = jobs.read_stream_from_dir(spark, staged_dir, max_files_per_trigger=1)
    got = jobs.run_to_table(jobs.hourly_tumbling(ev), mode="complete")
    want = get_query("events_hourly_tumbling").spark(spark, sf_dir)
    _assert_same(got, want)


def test_stateful_counts_accumulate_across_batches(spark, sf_dir, staged_dir):
    """applyInPandasWithState: per-user GroupState must accumulate over 4
    batches; only the LAST update per user may equal the batch total."""
    from pyspark.sql import functions as F

    from energy_emissions_lakehouse_spark.tables import t

    ev = jobs.read_stream_from_dir(spark, staged_dir, max_files_per_trigger=1)
    emitted = jobs.run_to_table(jobs.stateful_user_stats(ev), mode="update")
    # update mode emits one row per (user, batch-containing-user): keep the
    # final (max n_events) emission per user.
    final = emitted.groupBy("user_id").agg(
        F.max("n_events").alias("n_events")
    )
    want = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    _assert_same(final, want)
    # state really did span batches: users seen in >1 batch emitted >1 row
    multi = emitted.groupBy("user_id").count().filter(F.col("count") > 1)
    assert multi.count() > 0, "expected multi-batch state updates"


def test_checkpoint_recovery_exactly_once(spark, sf_dir, tmp_path):
    """Stop/restart with a checkpoint must resume exactly once: run a
    windowed aggregation over half the data, terminate, add the second
    half, restart with the SAME checkpoint — the final result must equal
    the one-shot batch aggregate (no duplicated or lost state)."""
    import os

    from pyspark.sql import functions as F

    from energy_emissions_lakehouse_spark.streaming import jobs
    from energy_emissions_lakehouse_spark.tables import t

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    ev = t(spark, sf_dir, "events")
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1)
    half1.coalesce(1).write.mode("append").parquet(src)

    def run(name):
        stream = (
            spark.readStream.schema(ev.schema).parquet(src)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            r["event_type"]: r["n"] for r in spark.table(name).collect()
        }

    first = run("ckpt_run1")
    assert sum(first.values()) == half1.count()
    half2.coalesce(1).write.mode("append").parquet(src)
    second = run("ckpt_run2")
    want = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert second == want



def test_coarse_sessionize_state_splices_across_batches(spark, sf_dir, tmp_path):
    """The coarsened-key sessionizer's cross-batch path: a session whose
    events straddle a micro-batch boundary must SPLICE onto the bucket's
    stored open session (the single-file replay never exercises this —
    its one data batch starts every session fresh). Events are split into
    two files at a boundary chosen INSIDE a known session (plus a flush
    sentinel), streamed one file per trigger, and the closed sessions
    must equal the batch gaps-and-islands answer exactly."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from energy_emissions_lakehouse_spark.tables import EVENTS_SCHEMA

    ev = t(spark, sf_dir, "events").select(EVENTS_SCHEMA.fieldNames())
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    hi = ev.agg(F.max("ts")).collect()[0][0]
    # pick the boundary INSIDE a known session so the straddle is
    # guaranteed: the 2nd event of some in-gap consecutive pair — events
    # before it land in file 1, the rest in file 2, and that user's open
    # session must splice across the batch boundary
    w = Window.partitionBy("user_id").orderBy("ts")
    pairs = (
        ev.select("user_id", "ts")
        .withColumn("prev", F.lag("ts").over(w))
        .filter(
            F.col("prev").isNotNull()
            & (
                F.col("ts").cast("timestamp").cast("long")
                - F.col("prev").cast("timestamp").cast("long")
                <= jobs.SESSION_GAP_SECONDS
            )
        )
        .orderBy("ts")
        .limit(1)
        .collect()
    )
    assert pairs, "testdata has no in-session consecutive pair"
    boundary = pairs[0]["ts"]
    bounds = [boundary]
    slices = [
        ev.filter(F.col("ts") < boundary),
        ev.filter(F.col("ts") >= boundary),
    ]
    for s in slices:  # sequential writes -> increasing mtimes -> in-order batches
        s.coalesce(1).write.mode("append").parquet(src)
    sentinel = [(-1, hi + dt.timedelta(days=2), -1, "__flush__", 0.0, "{}")]
    spark.createDataFrame(sentinel, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got = (
        jobs.run_to_table(
            jobs.stateful_session_close_coarse(stream), mode="append",
            state_partitions=8,
        )
        .filter(F.col("user_id") >= 0)
        .select(
            "user_id",
            F.date_trunc("second", "session_start").alias("session_start"),
            "n_events",
        )
    )

    gap = F.lag("ts").over(Window.partitionBy("user_id").orderBy("ts"))
    marked = ev.select("user_id", "ts").withColumn(
        "brk",
        F.when(
            gap.isNull()
            | (
                F.col("ts").cast("timestamp").cast("long")
                - gap.cast("timestamp").cast("long")
                > jobs.SESSION_GAP_SECONDS
            ),
            1,
        ).otherwise(0),
    )
    sessions = (
        marked.withColumn(
            "sid",
            F.sum("brk").over(
                Window.partitionBy("user_id").orderBy("ts")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.date_trunc("second", F.min("ts")).alias("session_start"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    want = sessions.select("user_id", "session_start", "n_events")
    _assert_same(got, want)
    # the splice path genuinely ran: at least one oracle session straddles
    # a batch boundary (starts before it, last event at/after it)
    straddle = sessions.filter(
        (F.col("session_start") < F.lit(bounds[0]))
        & (F.col("last_ts") >= F.lit(bounds[0]))
    )
    assert straddle.count() > 0, "no session crossed a batch boundary"


def test_ingest_neardup_chunked_arrival_equals_one_shot(spark, sf_dir):
    """The stateless ingest dedup gate must produce the identical pair
    set whether the incoming batch arrives as one micro-batch or drips
    in as three (maxFilesPerTrigger=1) — stream-static joins re-execute
    per batch with no cross-batch state to get wrong."""
    one = jobs.stream_ingest_neardup_pairs(spark, sf_dir).select(
        "new_id", "hist_id", "sim"
    )
    chunked = jobs.stream_ingest_neardup_pairs(spark, sf_dir, n_files=3).select(
        "new_id", "hist_id", "sim"
    )
    _assert_same(chunked, one)


def test_rowwise_minhash_equals_grouped_signatures(spark, sf_dir):
    """The streaming gate's row-wise MinHash (array_min over affine
    transforms) must be BIT-IDENTICAL to the batch explode+groupBy
    signatures for every document — the equivalence the ingest gate's
    band joins silently rely on (a single differing signature value
    would desynchronize the band keys between stream and index)."""
    from pyspark.sql import functions as F

    from energy_emissions_lakehouse_spark.operators import dedup as dd
    from energy_emissions_lakehouse_spark.operators import text as tx

    docs = t(spark, sf_dir, "documents")
    doc_sh = dd.doc_shingles(docs)
    grouped = dd.minhash_signatures(doc_sh)
    rowwise = (
        docs.select(
            "doc_id", tx.shingles(tx.tokens(F.col("text")), n=3).alias("sh")
        )
        .select("doc_id", *jobs.rowwise_minhash_cols("sh"))
        .filter(F.size("_hids") > 0)  # grouped form drops shingle-less docs
        .drop("_hids")
    )
    _assert_same(rowwise, grouped)
