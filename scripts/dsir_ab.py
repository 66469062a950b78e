"""Interleaved A/B: q_dsir_weights old (3-pass) vs new (2-pass) plan.

Usage: python scripts/dsir_ab.py [sf_dir] [repeats]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_asana_spark import catalog
from etl_asana_spark.operators import text
from etl_asana_spark.registry import load_tables
from etl_asana_spark.session import build_session


def old_plan(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "doc_id", "lang", F.explode(text.ws_tokens("text")).alias("token")
    )
    stats = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("c_all"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("double")
        .alias("c_t"),
    )
    tot = toks.agg(
        F.count(F.lit(1)).cast("double").alias("n_all"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("double")
        .alias("n_t"),
        F.countDistinct("token").cast("double").alias("v"),
    )
    lr = stats.crossJoin(F.broadcast(tot)).select(
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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = build_session(app_name="dsir_ab")
    spark.sparkContext.setLogLevel("ERROR")
    new_fn = catalog.queries()["q_dsir_weights"]

    def run_old():
        old_plan(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def run_new():
        new_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    variants = {"old_3pass": run_old, "new_2pass": run_new}
    for fn in variants.values():
        fn()
    times = {n: [] for n in variants}
    for _ in range(repeats):
        for n, fn in variants.items():
            t0 = time.perf_counter()
            fn()
            times[n].append(time.perf_counter() - t0)
    for n, ts in times.items():
        print(f"{n}: min={min(ts):.3f}s all={[round(t, 3) for t in ts]}")

    a = sorted(map(tuple, old_plan(spark, sf_dir).collect()))
    b = sorted(map(tuple, new_fn(spark, sf_dir).collect()))
    print("rows identical:", a == b, f"({len(a)} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
