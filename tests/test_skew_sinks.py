"""Property tests: skew-mitigation operators and partitioned file sinks."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from etl_asana_spark.operators import skew
from etl_asana_spark.registry import load_tables
from etl_asana_spark.sources import sinks
from etl_asana_spark.testing import canonical_rows


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salting must be pure mechanics: row-identical to the unsalted join."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].select("event_id", "user_id", "event_type", "value")
    dim = (
        t["events"].groupBy("user_id").agg(F.count("*").alias("user_events"))
    )
    plain = ev.join(dim, ["user_id"])
    salted = skew.salted_join(
        ev, dim, ["user_id"], n_salts=8, salt_src=["event_id"]
    )
    assert canonical_rows(salted.toPandas()) == canonical_rows(plain.toPandas())


def test_salted_join_replicates_dim_not_fact(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    ev = t["events"].select("event_id", "user_id")
    dim = t["events"].select("user_id").distinct()
    plan = skew.salted_join(
        ev, dim, ["user_id"], n_salts=4, salt_src=["event_id"]
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "explode" in plan.lower()  # dim side replicated via explode(sequence)


def test_salted_sum_equals_plain_sum(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    plain = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum(F.col("value").cast("decimal(25,6)")).alias("total")
    )
    salted = skew.salted_sum_by_key(
        ev,
        ["event_type"],
        {"n": F.count("*"), "total": F.sum(F.col("value").cast("decimal(25,6)"))},
        n_salts=8,
        salt_src=["event_id"],
    )
    assert canonical_rows(salted.toPandas()) == canonical_rows(plain.toPandas())


def test_partitioned_sink_prunes_partitions(spark, sf_dir):
    """#9: date-partitioned events write; a day filter on readback must
    become a PartitionFilter (directory prune), not a data filter."""
    t = load_tables(spark, sf_dir)
    target = os.path.join(tempfile.mkdtemp(prefix="sink_"), "events_by_day")
    sinks.write_events_by_day(t["events"], target)

    back = sinks.read_back(spark, target)
    assert back.count() == t["events"].count()

    one_day = back.filter(F.col("event_date") == "2024-01-05")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "event_date" in plan.split("PartitionFilters")[1][:200]
    expected = t["events"].filter(F.to_date("ts") == "2024-01-05").count()
    assert one_day.count() == expected


def test_sink_roundtrip_formats(spark, sf_dir):
    """parquet/json/csv writes all round-trip row counts."""
    t = load_tables(spark, sf_dir)
    nation = t["nation"]
    for fmt in ("parquet", "json", "csv"):
        target = os.path.join(tempfile.mkdtemp(prefix="sink_"), fmt)
        sinks.write_table(nation, target, fmt=fmt)
        back = sinks.read_back(spark, target, fmt=fmt)
        assert back.count() == nation.count(), fmt


def test_salted_join_left_keeps_unmatched_fact(spark, sf_dir):
    """Left salted join preserves unmatched fact rows exactly once."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].select("event_id", "user_id")
    half_dim = (
        t["events"].select("user_id").distinct()
        .filter(F.col("user_id") % 2 == 0)
        .withColumn("flag", F.lit(1))
    )
    plain = ev.join(half_dim, ["user_id"], "left")
    salted = skew.salted_join(
        ev, half_dim, ["user_id"], n_salts=4, salt_src=["event_id"], how="left"
    )
    assert canonical_rows(salted.toPandas()) == canonical_rows(plain.toPandas())


def test_salted_join_rejects_dim_preserving_joins(spark, sf_dir):
    import pytest as _pytest

    t = load_tables(spark, sf_dir)
    ev = t["events"].select("event_id", "user_id")
    dim = t["events"].select("user_id").distinct()
    with _pytest.raises(ValueError, match="fact-preserving"):
        skew.salted_join(ev, dim, ["user_id"], n_salts=4,
                         salt_src=["event_id"], how="full")
