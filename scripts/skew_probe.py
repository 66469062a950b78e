"""Skew probe (r06 verdict item 5): measure what salting + AQE skew-split
buy on a zipf-shaped corpus at sf0.1-like volume.

Usage: python scripts/skew_probe.py [n_rows]

Prints one JSON line: post-shuffle max-partition rows for the unsalted vs
salted layouts (several salt counts), wall-clock for the hot-key
aggregation both ways, and whether AQE's final plan split the skewed join
(``skew=true``). Results go into SURVEY.md's round addendum.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_asana_spark.operators import skew  # noqa: E402

N_PARTS = 32


def skewed_events(spark: SparkSession, n: int) -> DataFrame:
    return (
        spark.range(n)
        .withColumn(
            "user_id",
            F.when(F.col("id") % 10 < 4, F.lit(0)).otherwise(
                F.pmod(F.xxhash64("id"), F.lit(997)) + 1
            ),
        )
        .withColumn("value", (F.col("id") % 1000).cast("double"))
        .select(F.col("id").alias("event_id"), "user_id", "value")
    )


def max_partition_rows(df: DataFrame, cols: list[str]) -> int:
    return (
        df.repartition(N_PARTS, *[F.col(c) for c in cols])
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", str(N_PARTS))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ev = skewed_events(spark, n).cache()
    ev.count()

    out: dict = {"n_rows": n, "hot_share": 0.4, "n_parts": N_PARTS}
    out["max_partition_unsalted"] = max_partition_rows(ev, ["user_id"])
    out["max_partition_salted"] = {
        s: max_partition_rows(
            ev.withColumn("__salt", skew._deterministic_salt(["event_id"], s)),
            ["user_id", "__salt"],
        )
        for s in (8, 16, 32, 64)
    }

    plain_agg = lambda: ev.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("total")
    ).write.format("noop").mode("overwrite").save()
    salted_agg = lambda: skew.salted_sum_by_key(
        ev, ["user_id"],
        {"n": F.count("*"), "total": F.sum("value")},
        n_salts=32, salt_src=["event_id"],
    ).write.format("noop").mode("overwrite").save()
    out["agg_wall_s"] = {"plain": timed(plain_agg), "salted_32": timed(salted_agg)}

    # AQE skew-split on the join (thresholds scaled to the corpus)
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256kb",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128kb",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }.items():
        spark.conf.set(k, v)
    dim = spark.range(1000).select(
        F.col("id").alias("user_id"),
        F.lpad(F.col("id").cast("string"), 32, "d").alias("attr"),
    )
    joined = ev.join(dim, "user_id")
    out["join_rows"] = joined.count()
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    out["aqe_skew_split"] = "skew=true" in plan

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
