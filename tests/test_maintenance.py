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
