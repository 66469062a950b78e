"""Compaction and schema-evolution maintenance ops."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from etl_asana_spark.registry import load_tables
from etl_asana_spark.sources import maintenance
from etl_asana_spark.testing import canonical_rows


def test_compaction_reduces_files_preserves_rows(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="compact_")
    src, dst = os.path.join(base, "many"), os.path.join(base, "few")
    ev = load_tables(spark, sf_dir)["events"]
    ev.repartition(64).write.parquet(src)  # simulate small-file accretion
    assert len(glob.glob(f"{src}/part-*.parquet")) == 64

    before = canonical_rows(spark.read.parquet(src).toPandas())
    # tiny target so the test exercises the sizing math (not one giant file)
    n = maintenance.compact_parquet(spark, src, target_bytes=256 * 1024, out_path=dst)
    files = glob.glob(f"{dst}/part-*.parquet")
    assert len(files) == n < 64
    assert canonical_rows(spark.read.parquet(dst).toPandas()) == before


def test_schema_evolution_merged_read(spark, sf_dir):
    """v2 files add a column; merged read unions schemas, old rows get NULL."""
    base = tempfile.mkdtemp(prefix="evolve_")
    nation = load_tables(spark, sf_dir)["nation"]
    nation.write.parquet(base, mode="append")  # v1 schema
    nation.withColumn("iso_code", F.concat(F.lit("N"), F.col("n_nationkey"))) \
        .write.parquet(base, mode="append")    # v2 adds iso_code

    merged = maintenance.read_evolved(spark, base)
    assert "iso_code" in merged.columns
    n = nation.count()
    assert merged.count() == 2 * n
    assert merged.filter(F.col("iso_code").isNull()).count() == n  # v1 rows
    assert merged.filter(F.col("iso_code").isNotNull()).count() == n


def test_cdc_apply_is_replay_idempotent(spark, sf_dir):
    """Applying the same change feed to an already-merged snapshot must be a
    no-op for U/I (full-row images) and keep tombstoned keys absent."""
    from etl_asana_spark.operators import cdc

    orders = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    m = F.col("o_orderkey") % 7
    feed = (
        orders.filter(m == 0)
        .select(F.lit("D").alias("op"), "o_orderkey", "o_orderstatus", "o_totalprice")
        .unionByName(
            orders.filter(m == 1).select(
                F.lit("U").alias("op"), "o_orderkey", "o_orderstatus",
                (F.col("o_totalprice") * F.lit(1.1)).alias("o_totalprice"),
            )
        )
    )
    once = cdc.apply_changes(orders, feed, "o_orderkey", op_col="op")
    twice = cdc.apply_changes(once, feed, "o_orderkey", op_col="op")
    assert canonical_rows(twice.toPandas()) == canonical_rows(once.toPandas())


def test_cdc_latest_change_wins_with_ts(spark, sf_dir):
    """With ts_col, only the newest change per key applies — an older delete
    must lose to a newer update."""
    from etl_asana_spark.operators import cdc

    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, v string"
    )
    feed = spark.createDataFrame(
        [("D", 1, "x", 10), ("U", 1, "a2", 20), ("D", 2, "y", 30)],
        "op string, k int, v string, ts int",
    )
    out = {r["k"]: r["v"] for r in
           cdc.apply_changes(base, feed, "k", op_col="op", ts_col="ts").collect()}
    assert out == {1: "a2"}  # key 1: newer U beats older D; key 2 tombstoned
