"""A/B: HDFS-backed vs RocksDB state store for the bounded streaming drains.

The r10 verdict's one remaining streaming lever: addBatch (state commit) is
~85% of a warm drain, so the state-store backend is the floor-mover left.
Interleaved min-of-N per provider per key, same session; the provider is
selected via SPARK_GRAFT_STATE_PROVIDER, which the engine reads at each
drain start (the checkpoint is fresh per run, so switching is safe).

Adoption rule (r10 verdict item 6): flip the default only if RocksDB wins
the FAMILY by >= 20%.

Usage: python scripts/state_provider_ab.py [sf_dir] [repeats] [keys...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_asana_spark import catalog
from etl_asana_spark.session import build_session

KEYS = (
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_dedup",
    "q_stream_upsert",
    "q_stream_stream_join",
    "q_stream_source_sync",
    "q_stream_static_join",
    "q_stream_session",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    keys = tuple(sys.argv[3:]) or KEYS
    spark = build_session(app_name="state_provider_ab")
    spark.sparkContext.setLogLevel("ERROR")
    queries = catalog.queries()

    def run(key: str) -> None:
        queries[key](spark, sf_dir).collect()

    results: dict[tuple[str, str], list[float]] = {}
    rows_by: dict[tuple[str, str], list] = {}
    for key in keys:
        for provider in ("hdfs", "rocksdb"):
            os.environ["SPARK_GRAFT_STATE_PROVIDER"] = provider
            run(key)  # warm-up per provider (JIT + native lib load)
        for _ in range(repeats):
            for provider in ("hdfs", "rocksdb"):
                os.environ["SPARK_GRAFT_STATE_PROVIDER"] = provider
                t0 = time.perf_counter()
                run(key)
                results.setdefault((key, provider), []).append(
                    time.perf_counter() - t0
                )
        for provider in ("hdfs", "rocksdb"):
            os.environ["SPARK_GRAFT_STATE_PROVIDER"] = provider
            rows_by[(key, provider)] = sorted(
                tuple(r) for r in queries[key](spark, sf_dir).collect()
            )
        same = rows_by[(key, "hdfs")] == rows_by[(key, "rocksdb")]
        h = min(results[(key, "hdfs")])
        r = min(results[(key, "rocksdb")])
        print(
            f"{key}: hdfs={h:.3f}s rocksdb={r:.3f}s "
            f"ratio={r / h:.3f} rows_identical={same}"
        )
    os.environ.pop("SPARK_GRAFT_STATE_PROVIDER", None)
    th = sum(min(results[(k, 'hdfs')]) for k in keys)
    tr = sum(min(results[(k, 'rocksdb')]) for k in keys)
    print(f"family total: hdfs={th:.3f}s rocksdb={tr:.3f}s ratio={tr / th:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
