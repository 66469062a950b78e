"""Decompose the q_stream_source_sync cost floor (r09 verdict item 6).

The key drains a 4-poll sync-token Python DataSource through a memory sink
(complete mode) with a fresh checkpoint — ~3.5 s at the sf0.01 gate. This
probe runs the drain once in-process and prints:

- wall time split: session setup, query.start(), processAllAvailable(),
  stop();
- per-microbatch durationMs from recentProgress (triggerExecution,
  addBatch, walCommit, commitOffsets, latestOffset, queryPlanning,
  getBatch) — the WAL/checkpoint floor vs compute split the verdict asked
  to see measured once.

Usage: python scripts/stream_sync_probe.py [repeats]
"""

from __future__ import annotations

import json
import sys
import time
import uuid

sys.path.insert(0, ".")


def main() -> int:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    t0 = time.perf_counter()
    from pyspark.sql import functions as F

    from etl_asana_spark.session import build_session
    from etl_asana_spark.sources.datasource import register_asana_stream_source
    from etl_asana_spark.streaming.jobs import STORIES_FIXTURE, fresh_dir

    spark = build_session(app_name="stream-sync-probe")
    spark.sparkContext.setLogLevel("ERROR")
    t_session = time.perf_counter() - t0

    register_asana_stream_source(spark)
    out = {"session_s": round(t_session, 3), "runs": []}
    for i in range(repeats):
        feed = (
            spark.readStream.format("asana_events")
            .option("path", STORIES_FIXTURE)
            .option("batch_lines", "100")
            .load()
        )
        agg = feed.groupBy("type").agg(F.count("*").alias("n_stories"))
        name = f"probe_{uuid.uuid4().hex[:10]}"
        t0 = time.perf_counter()
        query = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", fresh_dir("ckpt"))
            .start()
        )
        t_start = time.perf_counter() - t0
        t0 = time.perf_counter()
        query.processAllAvailable()
        t_drain = time.perf_counter() - t0
        progress = [json.loads(p.json) for p in query.recentProgress]
        t0 = time.perf_counter()
        query.stop()
        t_stop = time.perf_counter() - t0
        batches = [
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": p.get("durationMs"),
            }
            for p in progress
        ]
        # Sum each duration component across microbatches.
        comp: dict[str, int] = {}
        for b in batches:
            for k, v in (b["durationMs"] or {}).items():
                comp[k] = comp.get(k, 0) + int(v)
        out["runs"].append(
            {
                "start_s": round(t_start, 3),
                "drain_s": round(t_drain, 3),
                "stop_s": round(t_stop, 3),
                "n_batches": len(batches),
                "rows": sum(b["numInputRows"] or 0 for b in batches),
                "durationMs_sum": comp,
                "batches": batches,
            }
        )
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
