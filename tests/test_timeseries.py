"""Behavioral properties of the time-series tier (queries/timeseries.py).

The oracle parity suite already value-checks these against DuckDB; here we
pin the *semantic* invariants that would catch a wrong-but-consistent
implementation on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from energy_emissions_lakehouse_spark.queries.timeseries import (
    CUSUM_TOPK,
    events_cusum_drift,
    events_hourly_ewma,
    events_hourly_interpolate,
)


def test_ewma_first_row_equals_count_and_stays_in_range(spark, sf_dir):
    """Warm-up renormalization: with one tap present, ewma == cnt exactly;
    and a convex combination can never leave the [min, max] count range
    seen in its 16-tap history — pin the global range as a cheap proxy."""
    df = events_hourly_ewma(spark, sf_dir).cache()
    firsts = (
        df.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("hour_ts")
            ),
        )
        .filter("rn = 1")
        .filter(F.abs(F.col("ewma") - F.col("cnt")) > 1e-9)
        .count()
    )
    assert firsts == 0
    stats = df.groupBy("event_type").agg(
        F.min("cnt").alias("lo"),
        F.max("cnt").alias("hi"),
        F.min("ewma").alias("elo"),
        F.max("ewma").alias("ehi"),
    )
    bad = stats.filter(
        (F.col("elo") < F.col("lo")) | (F.col("ehi") > F.col("hi"))
    ).count()
    assert bad == 0
    df.unpersist()


def test_interpolation_fills_every_spine_hour_and_bounds_hold(spark, sf_dir):
    df = events_hourly_interpolate(spark, sf_dir).cache()
    # the spine is dense: per event type, rows == hours between min and max
    spans = df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (
            (
                F.unix_timestamp(F.max("hour_ts"))
                - F.unix_timestamp(F.min("hour_ts"))
            )
            / 3600
            + 1
        )
        .cast("long")
        .alias("expected"),
    )
    assert spans.filter("n != expected").count() == 0
    # interpolated values stay within the neighbor value envelope: a linear
    # blend is bounded by the series' global min/max of actual values
    actual = df.filter("kind = 'actual'").groupBy("event_type").agg(
        F.min("hourly_value").alias("lo"), F.max("hourly_value").alias("hi")
    )
    bad = (
        df.filter("kind = 'interpolated'")
        .join(actual, "event_type")
        .filter(
            (F.col("hourly_value") < F.col("lo"))
            | (F.col("hourly_value") > F.col("hi"))
        )
        .count()
    )
    assert bad == 0
    # edges (if any) carry no fabricated value
    assert df.filter("kind = 'edge' AND hourly_value IS NOT NULL").count() == 0
    df.unpersist()


def test_cusum_peaks_are_nonnegative_and_ranked(spark, sf_dir):
    df = events_cusum_drift(spark, sf_dir).cache()
    assert df.filter("cusum < 0").count() == 0
    perkey = df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("peak_rank").alias("rmin"),
        F.max("peak_rank").alias("rmax"),
    )
    bad = perkey.filter(
        (F.col("n") > CUSUM_TOPK)
        | (F.col("rmin") != 1)
        | (F.col("rmax") != F.col("n"))
    ).count()
    assert bad == 0
    df.unpersist()
