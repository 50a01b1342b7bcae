"""Cross-engine exact aggregation helpers ("cents trick").

Floating-point sums depend on summation order, and Spark's parallel partial
aggregation orders differently from DuckDB's sequential scan — so a plain
``sum(double)`` drifts by ~1e-5 at 100k-row scale and can flip a rounded
digit. These helpers quantize each value to a scaled BIGINT *before* the sum:
integer addition is associative, so both engines produce the identical bit
pattern, and the final ``/ scale`` division is a single exactly-rounded IEEE
op. The Spark and SQL variants are kept textually parallel — any change must
be applied to both.

At 100 TB this is also the *fast* path: the round/cast/sum pipeline is all
whole-stage-codegen JVM arithmetic, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def scaled_sum(col: Column, scale: int = 100) -> Column:
    """Order-independent ``sum(col)`` exact to 1/scale, as double."""
    return F.sum(F.round(col * F.lit(scale), 0).cast("long")).cast("double") / F.lit(
        float(scale)
    )


def scaled_sum_sql(expr: str, scale: int = 100) -> str:
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {scale}, 0) AS BIGINT)) AS DOUBLE)"
        f" / {float(scale)}"
    )


def scaled_avg(col: Column, scale: int = 100) -> Column:
    """Order-independent mean exact to 1/scale of the numerator."""
    total = F.sum(F.round(col * F.lit(scale), 0).cast("long")).cast("double")
    return total / F.lit(float(scale)) / F.count(F.lit(1)).cast("double")


def scaled_avg_sql(expr: str, scale: int = 100) -> str:
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {scale}, 0) AS BIGINT)) AS DOUBLE)"
        f" / {float(scale)} / CAST(COUNT(*) AS DOUBLE)"
    )
