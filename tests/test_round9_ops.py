"""Behavioral pins for the round-9 operator batch.

- asof_nearest_join: direction choice, tie rules, missing-side nulls
  (synthetic frames — every branch of the CASE exercised by construction);
- doc_duplicate_span_coverage: exact expected counts on a constructed
  corpus (two docs sharing one span, one isolated doc);
- bottomk_sample_orders: KMV invariants — rank totality, hash-order
  monotonicity, estimator sanity against the true count;
- embedding_dim_covariance: integer identity cross-checked against the
  quadratic self-join form the oracle states.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from energy_emissions_lakehouse_spark.registry import get_query


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_asof_nearest_direction_and_ties(spark):
    from energy_emissions_lakehouse_spark.operators.asof import (
        asof_nearest_join,
    )

    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01 10:00:00")),  # fwd strictly closer
            (1, 101, _ts("2024-01-01 10:10:00")),  # tie -> backward
            (2, 200, _ts("2024-01-01 09:00:00")),  # only fwd exists
            (3, 300, _ts("2024-01-01 09:00:00")),  # no right rows at all
            (4, 400, _ts("2024-01-01 12:00:00")),  # equal ts -> gap 0
        ],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:50:00"), 1.0, 900),  # 10 min before L100
            (1, _ts("2024-01-01 10:05:00"), 2.0, 901),  # 5 min after L100,
            # 5 min before L101
            (1, _ts("2024-01-01 10:15:00"), 3.0, 902),  # 5 min after L101
            (2, _ts("2024-01-01 09:30:00"), 4.0, 903),
            (4, _ts("2024-01-01 12:00:00"), 5.0, 904),
            (4, _ts("2024-01-01 12:00:00"), 6.0, 905),  # same ts: 905 wins
        ],
        "user_id long, ts timestamp, value double, event_id long",
    )
    out = {
        r["event_id"]: r
        for r in asof_nearest_join(
            left, right, on="user_id", ts="ts",
            payload=["value"], right_tiebreak="event_id",
        ).collect()
    }
    assert out[100]["nearest_value"] == 2.0  # forward 5min beats back 10min
    assert out[100]["gap_us"] == 5 * 60 * 1_000_000
    assert out[101]["nearest_value"] == 2.0  # 5min tie -> backward
    assert out[200]["nearest_value"] == 4.0  # backward only
    assert out[300]["nearest_value"] is None
    assert out[300]["gap_us"] is None
    assert out[400]["gap_us"] == 0
    assert out[400]["nearest_value"] == 6.0  # equal-ts: last event_id wins


def test_span_coverage_exact_on_constructed_corpus(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            # doc 1/2 share exactly one 3-gram ("red green blue"); each has
            # 2 distinct spans total
            (1, "red green blue alpha", "en", "s", 20),
            (2, "red green blue omega", "en", "s", 20),
            (3, "one two three four", "en", "s", 18),  # isolated
            (4, "hi there", "en", "s", 8),  # <3 tokens: no spans, no row
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in get_query("doc_duplicate_span_coverage")
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert set(out) == {1, 2, 3}
    for d in (1, 2):
        assert out[d]["n_spans"] == 2
        assert out[d]["n_dup_spans"] == 1
        assert out[d]["dup_frac"] == 0.5
    assert out[3]["n_spans"] == 2
    assert out[3]["n_dup_spans"] == 0
    assert out[3]["dup_frac"] == 0.0


def test_bottomk_sample_invariants(spark, sf_dir):
    from energy_emissions_lakehouse_spark.queries.advanced_olap import (
        BOTTOMK_K,
    )
    from energy_emissions_lakehouse_spark.tables import t

    rows = (
        get_query("bottomk_sample_orders")
        .spark(spark, sf_dir)
        .orderBy("sample_rank")
        .collect()
    )
    n_orders = t(spark, sf_dir, "orders").count()
    assert len(rows) == min(BOTTOMK_K, n_orders)
    assert [r["sample_rank"] for r in rows] == list(range(1, len(rows) + 1))
    us = [r["u"] for r in rows]
    assert us == sorted(us)
    assert len({r["o_orderkey"] for r in rows}) == len(rows)
    # KMV estimator: (K-1)/u_(K) is unbiased with RSE ~ 1/sqrt(K-2) (~10%
    # at K=100); 3 sigma at the test SF
    est = rows[0]["est_total_rows"]
    assert abs(est - n_orders) <= max(0.35 * n_orders, 50), (est, n_orders)


def test_dim_covariance_matches_quadratic_form(spark, sf_dir):
    from energy_emissions_lakehouse_spark.tables import t

    out = get_query("embedding_dim_covariance").spark(spark, sf_dir).collect()
    assert len(out) == 20
    assert all(r["i"] < r["j"] for r in out)
    mags = [abs(r["cov_num"]) for r in out]
    assert mags == sorted(mags, reverse=True)

    # recompute via the oracle's quadratic self-join shape, in Spark
    emb = t(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id",
        F.posexplode(
            F.expr(
                "transform(embedding,"
                " v -> cast(round(cast(v as double) * 10000, 0) as bigint))"
            )
        ).alias("i", "x"),
    )
    n = emb.count()
    a = dims.select("vec_id", F.col("i").alias("ai"), F.col("x").alias("ax"))
    b = dims.select("vec_id", F.col("i").alias("bi"), F.col("x").alias("bx"))
    sxy = {
        (r["ai"], r["bi"]): r["sxy"]
        for r in a.join(b, "vec_id")
        .filter(F.col("ai") < F.col("bi"))
        .groupBy("ai", "bi")
        .agg(F.sum(F.col("ax") * F.col("bx")).alias("sxy"))
        .collect()
    }
    sx = {
        r["i"]: r["sx"]
        for r in dims.groupBy("i").agg(F.sum("x").alias("sx")).collect()
    }
    for r in out:
        expect = n * sxy[(r["i"], r["j"])] - sx[r["i"]] * sx[r["j"]]
        assert r["cov_num"] == expect, (r["i"], r["j"])
