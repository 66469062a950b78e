"""Late-data semantics (#57): what the watermark actually guarantees.

Spark's documented contract is asymmetric: data newer than the watermark is
NEVER dropped, but late data is only GUARANTEED dropped once the window's
state has been emitted and evicted (while state is still live, a late row
may legally merge into it — observed directly when building this test: a
late row arriving one batch after the watermark passed, but before
eviction, was still counted).

So the test stages four micro-batches: the early window's state is emitted
and evicted (batch 3) BEFORE the late re-delivery arrives (batch 4). The
guarantee then holds: the closed window appears exactly once in the append
stream, the late row neither re-opens it nor double-emits it.
"""

from __future__ import annotations

import pytest

import os
import tempfile
import time
import uuid
from datetime import datetime

from pyspark.sql import functions as F


def _write_batch(spark, directory: str, name: str, rows: list[tuple], mtime: int):
    path = os.path.join(directory, name)
    rows = [(i, datetime.fromisoformat(ts), v) for i, ts, v in rows]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    df.coalesce(1).write.parquet(path)
    # the file stream source orders files by modification time: pin it
    for root, _, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))
    os.utime(path, (mtime, mtime))


@pytest.mark.slow  # ~28 s eviction drains; opt-in (r11, see pytest.ini)
def test_late_rows_after_eviction_are_dropped(spark):
    base = tempfile.mkdtemp(prefix="late_")
    now = int(time.time())
    # batch 1: row in window [00:00, 01:00)
    _write_batch(spark, base, "b1", [(1, "2024-03-01 00:30:00", 1.0)], now - 300)
    # batch 2: advances max event time to 06:00 (watermark 05:50 from batch 3 on)
    _write_batch(spark, base, "b2", [(2, "2024-03-01 06:00:00", 1.0)], now - 200)
    # batch 3: watermark now 05:50 > 01:00 → window emitted + state evicted here
    _write_batch(spark, base, "b3", [(3, "2024-03-01 06:30:00", 1.0)], now - 100)
    # batch 4: LATE re-delivery into the evicted window + an on-time row
    _write_batch(spark, base, "b4",
                 [(4, "2024-03-01 00:40:00", 1.0), (5, "2024-03-01 07:30:00", 1.0)],
                 now)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(base + "/*")
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("bucket"), "n")
    )
    sink = f"late_sink_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory").queryName(sink).outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(sink).collect()
    emitted = [r for r in rows if r["bucket"].isoformat() == "2024-03-01T00:00:00"]

    # exactly ONE emission of the closed window, count 1: the late event 4
    # neither merged in, re-opened state, nor caused a duplicate append
    assert len(emitted) == 1, rows
    assert emitted[0]["n"] == 1, rows
