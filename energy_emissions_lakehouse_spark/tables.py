"""Testdata table access (TESTDATA.md contract).

All driver-provided tables are plain parquet under ``{sf_dir}/{name}.parquet``.
Reads go through ``spark.read.parquet`` so Catalyst gets predicate pushdown +
column pruning for free; never hand-materialize.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from energy_emissions_lakehouse_spark.session import configure_runtime

#: Driver-registered oracle view names (BASELINE/TESTDATA contract).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Some testdata generations write events.ts as INT64 TIMESTAMP(NANOS), which
# Spark's parquet reader rejects ([PARQUET_TYPE_ILLEGAL]); others write plain
# TIMESTAMP(MICROS), which Spark reads natively. Detect from the parquet
# footer (one driver-side metadata read, memoized per path) and only apply
# the ns->µs workaround when the file really is nanos: read the physical
# int64 via an explicit schema and convert in the JVM (`div` = integer
# division; a double `/` would lose precision above 2^53 at epoch-nanos
# magnitude). Truncation toward zero matches DuckDB's ns->second flooring
# for positive epochs, so second-granularity outputs stay oracle-exact.
_EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

#: Canonical events schema after ts normalization — what ``t()`` returns and
#: what streaming sources read from their staged (pre-normalized) copies.
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

_EVENTS_TS_IS_NANOS: dict[tuple[str, int, int], bool] = {}

#: Per-session memo of table DataFrame HANDLES (round-13, guide §1/§5 —
#: the sub-second-tail floor): building a fresh parquet relation costs
#: ~90-120 ms of driver-side work per call (py4j round-trips + source
#: resolution + footer schema inference; measured on this host:
#: region.count() 225 ms from a fresh ``spark.read.parquet`` vs 125 ms
#: on a reused DataFrame, with the bare job floor at ~112 ms).  A
#: DataFrame is an immutable logical plan, so handing the same handle
#: back is semantically identical — every action still computes from the
#: parquet files; nothing resembling a RESULT is cached (same policy as
#: the per-session staged-stage memos in queries/medallion and
#: queries/text, which this predates).  Keyed by live session object
#: (WeakKeyDictionary: a stopped/collected session's entries vanish with
#: it, and a handle is only ever served back to the session that built
#: it) and by (path, mtime_ns, size) exactly like _EVENTS_TS_IS_NANOS —
#: regenerated testdata gets a fresh relation, stale plans cannot
#: survive a file swap.
_RELATION_MEMO: "WeakKeyDictionary[SparkSession, dict]" = None  # type: ignore[assignment]


def _relation_memo(spark: SparkSession) -> dict:
    global _RELATION_MEMO
    if _RELATION_MEMO is None:
        from weakref import WeakKeyDictionary

        _RELATION_MEMO = WeakKeyDictionary()
    per_session = _RELATION_MEMO.get(spark)
    if per_session is None:
        per_session = {}
        _RELATION_MEMO[spark] = per_session
    return per_session


def _events_ts_is_nanos(path: str) -> bool:
    # memo keyed on (path, mtime, size), not path alone: testdata is
    # regenerated between rounds, and a session spanning a regeneration
    # that flips the ts encoding would otherwise keep the stale ns-vs-µs
    # decision and read every timestamp 1000x off (the exact round-2
    # failure the footer probe exists to prevent)
    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    if key not in _EVENTS_TS_IS_NANOS:
        import pyarrow.parquet as pq

        ts_type = pq.read_schema(path).field("ts").type
        _EVENTS_TS_IS_NANOS[key] = str(getattr(ts_type, "unit", "")) == "ns"
    return _EVENTS_TS_IS_NANOS[key]


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Applies runtime parity conf (UTC, ANSI off)
    defensively — the driver hands us a session we didn't configure."""
    configure_runtime(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    st = os.stat(path)
    memo = _relation_memo(spark)
    key = (path, st.st_mtime_ns, st.st_size)
    df = memo.get(key)
    if df is None:
        if name == "events" and _events_ts_is_nanos(path):
            df = (
                spark.read.schema(_EVENTS_RAW_SCHEMA)
                .parquet(path)
                .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            )
        else:
            df = spark.read.parquet(path)
        if len(memo) >= 64:  # bound: plan handles, but never unbounded
            memo.pop(next(iter(memo)))
        memo[key] = df
    return df
