#!/usr/bin/env python
"""Streaming micro-batch overhead breakdown (guide §1 applied to the
stream_* family): runs one bounded availableNow replay and dumps every
micro-batch's durationMs map (addBatch / getBatch / latestOffset /
queryPlanning / walCommit / commitOffsets) so the fixed per-batch cost is
data, not guesswork.

Usage:
  SPARK_GRAFT_CPUS=32 python scripts/profile_stream.py [n_partitions]
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import functions as F

from energy_emissions_lakehouse_spark.session import get_spark
from energy_emissions_lakehouse_spark.streaming import jobs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    state_parts = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="eel-stream-profile", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # same pipeline as stream_hourly_event_stats: watermarked tumbling agg
    # over the flush-sentinel source (the canonical stream_* shape)
    stream = jobs.read_events_stream_with_flush(spark, sf_dir, n_sentinels=1)
    agg = jobs.hourly_tumbling(stream)

    name = f"prof_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_parts))
    t0 = time.perf_counter()
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.awaitTermination()
    wall = round(time.perf_counter() - t0, 3)

    batches = []
    for p in q.recentProgress:
        batches.append(
            {
                "batchId": p["batchId"],
                "numInputRows": p["numInputRows"],
                "durationMs": p["durationMs"],
            }
        )
    print(json.dumps({"wall": wall, "state_partitions": state_parts,
                      "batches": batches}, indent=1))


if __name__ == "__main__":
    main()
