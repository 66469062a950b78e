"""Cold-JVM A/B for q_dsir_weights — the driver's measurement condition.

The r10 verdict flagged the driver's cold reading regressing 0.74 -> 1.07 s
while the builder's warm interleaved A/B (scripts/dsir_ab.py) read a win;
this harness reproduces the driver's condition: each variant runs in a
FRESH JVM (subprocess), with bench.py's exact method (one warm-up, then
min-of-3 timed collect()s).

Variants:
  ckpt   — the registered 2-pass plan (stats localCheckpoint'd once)
  nockpt — the same 2-pass shape, stats NOT checkpointed (each broadcast
           consumer recomputes the stats subtree from the scan)
  old3   — the r9 3-pass plan (totals re-tokenize the corpus,
           COUNT(DISTINCT) expand)

Usage:
  python scripts/dsir_cold_ab.py [sf_dir] [rounds]          # orchestrate
  python scripts/dsir_cold_ab.py --variant ckpt [sf_dir]    # one cold run
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _build(variant: str, spark, sf_dir: str):
    from pyspark.sql import functions as F

    from etl_asana_spark import catalog
    from etl_asana_spark.operators import text
    from etl_asana_spark.registry import load_tables

    if variant == "ckpt":
        return catalog.queries()["q_dsir_weights"](spark, sf_dir)
    if variant == "old3":
        from dsir_ab import old_plan

        return old_plan(spark, sf_dir)
    assert variant == "nockpt"
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "doc_id", "lang", F.explode(text.ws_tokens("text")).alias("token")
    )
    stats = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("c_all_l"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("c_t_l"),
    )
    tot = stats.agg(
        F.sum("c_all_l").cast("double").alias("n_all"),
        F.sum("c_t_l").cast("double").alias("n_t"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    lr = stats.select(
        "token",
        F.col("c_all_l").cast("double").alias("c_all"),
        F.col("c_t_l").cast("double").alias("c_t"),
    ).crossJoin(F.broadcast(tot)).select(
        "token",
        F.floor(
            (
                F.log((F.col("c_t") + 1) / (F.col("n_t") + F.col("v")))
                - F.log((F.col("c_all") + 1) / (F.col("n_all") + F.col("v")))
            )
            * 1000000
            + 0.5
        )
        .cast("long")
        .alias("u"),
    )
    return (
        toks.join(F.broadcast(lr), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("u") / F.lit(1000000.0), 3).alias("w_logratio"),
        )
    )


def run_one(variant: str, sf_dir: str) -> None:
    from etl_asana_spark.session import build_session

    spark = build_session(app_name=f"dsir_cold_{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    _build(variant, spark, sf_dir).collect()  # warm-up (bench method)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        _build(variant, spark, sf_dir).collect()
        samples.append(time.perf_counter() - t0)
    print(json.dumps({"variant": variant, "min": round(min(samples), 4),
                      "all": [round(t, 4) for t in samples]}))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    if args and args[0] == "--variant":
        sf_dir = args[2] if len(args) > 2 else "/root/testdata/sf0.1"
        run_one(args[1], sf_dir)
        return 0
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    rounds = int(args[1]) if len(args) > 1 else 3
    results: dict[str, list[float]] = {}
    for r in range(rounds):
        for variant in ("ckpt", "nockpt", "old3"):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--variant",
                 variant, sf_dir],
                capture_output=True, text=True, check=True,
            )
            line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
            d = json.loads(line)
            results.setdefault(variant, []).append(d["min"])
            print(f"round {r} {variant}: {d['min']}s (cold-JVM min-of-3)")
    for v, xs in results.items():
        print(f"{v}: best={min(xs)} median={sorted(xs)[len(xs) // 2]} all={xs}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
