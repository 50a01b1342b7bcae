"""As-of (point-in-time) join — a custom operator Spark lacks natively.

``asof_join(left, right, ...)`` attaches to every left row the latest right
row with ``right.ts <= left.ts`` for the same key (the canonical "price as
of trade time" lookup; DuckDB/Pandas call it ASOF JOIN / merge_asof).

Spark-first implementation — union + running ``last(ignorenulls)`` window,
NOT a range join:
- both sides are tagged and unioned; each right row carries ONE struct
  column ``(ts, payload...)`` which is null on left rows — the struct is
  atomic, so a legitimately-NULL payload value can never fall back to an
  older right row (the classic ``ignorenulls`` pitfall);
- one window per key ordered by (ts, side, tiebreak) — right rows sort
  BEFORE left rows at equal ts, so ties match (<= semantics);
- ``F.last(struct, ignorenulls=True)`` over an unbounded-preceding frame
  carries the most recent right row forward onto each left row.

Scale: one shuffle on the key (same as any grouped window) and O(1) window
state — compare with the naive range-join formulation whose candidate set
explodes quadratically per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__eel_is_left"
_M = "__eel_match"
_TB = "__eel_tiebreak"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    payload: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``asof_ts`` + ``asof_<c>``
    for each payload column ``c`` from the latest ``right`` row at-or-before
    its ``ts`` (nulls when no prior right row exists).

    ``right_tiebreak`` orders equal-timestamp right rows (last one wins);
    pass a unique right column for deterministic results."""
    lcols = left.columns
    match = F.struct(F.col(ts).alias("ts"), *[F.col(c) for c in payload])
    r = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias(_SIDE),
        match.alias(_M),
        (F.col(right_tiebreak) if right_tiebreak else F.lit(0)).alias(_TB),
    )
    l = left.select(
        *lcols,
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_M].dataType).alias(_M),
        F.lit(None).cast(r.schema[_TB].dataType).alias(_TB),
    )
    merged = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col(_SIDE).asc(), F.col(_TB).asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = F.last(_M, ignorenulls=True).over(w)
    carried = merged.select(
        *lcols,
        F.col(_SIDE),
        m.getField("ts").alias("asof_ts"),
        *[m.getField(c).alias(f"asof_{c}") for c in payload],
    )
    return carried.filter(F.col(_SIDE) == 1).drop(_SIDE)


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    payload: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Nearest-in-time join: every ``left`` row, plus ``nearest_ts`` /
    ``nearest_<c>`` / ``gap_us`` from the right row whose timestamp is
    CLOSEST to the left timestamp (either direction) for the same key.

    pandas calls this ``merge_asof(direction='nearest')``; Spark has no
    native form.  Composition: the same union trick as :func:`asof_join`,
    but with TWO window passes over the ONE key shuffle —

    - backward: ascending (ts, side, tiebreak), ``last(ignorenulls)`` up to
      the current row — the latest right row at-or-before;
    - forward: the SAME frame over descending ts — the earliest right row
      at-or-after (right rows at equal ts still sort before left rows, and
      equal-ts right rows keep last-tiebreak-wins in both directions);

    then a per-row ``CASE`` picks the smaller absolute gap, ties going to
    the BACKWARD match (the earlier right row), matching the documented
    ``ORDER BY gap, right.ts`` tie rule of the lateral-subquery oracle.

    Scale: ONE shuffle on the key (the two windows share partitioning, so
    Catalyst inserts a second sort but no second exchange) and O(1) running
    state per window — never the quadratic per-key range-join expansion a
    naive ``ABS(gap)`` argmin join would produce."""
    lcols = left.columns
    match = F.struct(F.col(ts).alias("ts"), *[F.col(c) for c in payload])
    r = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias(_SIDE),
        match.alias(_M),
        (F.col(right_tiebreak) if right_tiebreak else F.lit(0)).alias(_TB),
    )
    l = left.select(
        *lcols,
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_M].dataType).alias(_M),
        F.lit(None).cast(r.schema[_TB].dataType).alias(_TB),
    )
    merged = l.unionByName(r, allowMissingColumns=True)

    frame = (Window.unboundedPreceding, Window.currentRow)
    wb = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col(_SIDE).asc(), F.col(_TB).asc_nulls_last())
        .rowsBetween(*frame)
    )
    wf = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).desc(), F.col(_SIDE).asc(), F.col(_TB).asc_nulls_last())
        .rowsBetween(*frame)
    )
    back = F.last(_M, ignorenulls=True).over(wb)
    fwd = F.last(_M, ignorenulls=True).over(wf)
    # timestamp_diff (not unix_micros) so TIMESTAMP and TIMESTAMP_NTZ
    # sources both resolve — parquet micros columns load as NTZ
    bgap = F.timestamp_diff("MICROSECOND", back.getField("ts"), F.col(ts))
    fgap = F.timestamp_diff("MICROSECOND", F.col(ts), fwd.getField("ts"))
    # ties (bgap == fgap, including the equal-timestamp gap-0 case, where
    # both passes resolve to the SAME right row) go backward
    use_fwd = back.getField("ts").isNull() | (
        fwd.getField("ts").isNotNull() & (fgap < bgap)
    )
    nearest = F.when(use_fwd, fwd).otherwise(back)
    gap = F.when(use_fwd, fgap).otherwise(bgap)
    carried = merged.select(
        *lcols,
        F.col(_SIDE),
        nearest.getField("ts").alias("nearest_ts"),
        *[nearest.getField(c).alias(f"nearest_{c}") for c in payload],
        gap.cast("long").alias("gap_us"),
    )
    return carried.filter(F.col(_SIDE) == 1).drop(_SIDE)
