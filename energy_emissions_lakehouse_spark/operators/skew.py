"""Skew-mitigation joins (SURVEY.md §4 / 100 TB design).

AQE's skew-join splitting handles most cases automatically; explicit
salting is the fallback when a handful of hot keys dominate a shuffle
(e.g. a null-heavy foreign key or a celebrity user). The transformation:

- the SKEWED side gets a deterministic pseudo-random salt in [0, S) per
  row, widening each hot key into S shuffle partitions;
- the COMPACT side (small per key, e.g. a dimension) is replicated S times,
  once per salt value;
- the equi-join runs on (keys..., salt) and the salt column is dropped —
  the result is row-identical to the unsalted join (verified by oracle).

Cost model: compact side inflates S-fold (keep S modest, 8-32); the skewed
side's hottest key now spreads across S tasks instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__eel_salt"


#: Join types for which the salt/replicate rewrite is row-identical to the
#: unsalted join. For right/full outer, unmatched COMPACT-side rows would
#: surface once per salt value (num_salts-fold duplicates) — for those,
#: salt the other side or dedupe the replicated side instead.
_SALTABLE = {"inner", "left", "leftouter", "left_outer"}


def salted_join(
    skewed: DataFrame,
    compact: DataFrame,
    keys: list[str],
    how: str = "inner",
    num_salts: int = 16,
) -> DataFrame:
    """Equi-join with the skewed side salted and the compact side
    replicated. Salt is a deterministic hash of the skewed row (xxhash64),
    so plans are reproducible run to run. Only inner/left joins are
    accepted (see _SALTABLE)."""
    if how not in _SALTABLE:
        raise ValueError(
            f"salted_join supports {sorted(_SALTABLE)}, got {how!r}: outer "
            "variants would emit unmatched compact-side rows once per salt"
        )
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(num_salts)
    ).cast("int")
    left = skewed.withColumn(SALT_COL, salt)
    right = compact.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return left.join(right, [*keys, SALT_COL], how).drop(SALT_COL)
