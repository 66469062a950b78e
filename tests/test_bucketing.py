"""Bucketed co-located joins: the Exchange must disappear."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_asana_spark.registry import load_tables
from etl_asana_spark.sources import bucketing
from etl_asana_spark.testing import canonical_rows


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="bucketed_")
    t = load_tables(spark, sf_dir)
    bucketing.write_bucketed(
        t["orders"], "orders_b", os.path.join(base, "orders_b"),
        bucket_by=["o_orderkey"], n_buckets=8, sort_by=["o_orderkey"],
    )
    bucketing.write_bucketed(
        t["lineitem"], "lineitem_b", os.path.join(base, "lineitem_b"),
        bucket_by=["l_orderkey"], n_buckets=8, sort_by=["l_orderkey"],
    )
    yield "orders_b", "lineitem_b"
    bucketing.drop_table(spark, "orders_b")
    bucketing.drop_table(spark, "lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_pair):
    """orders⋈lineitem on the bucket key: zero Exchange in the join subtree
    (the write-time bucketing IS the shuffle, paid once)."""
    o_name, l_name = bucketed_pair
    o, li = bucketing.read_table(spark, o_name), bucketing.read_table(spark, l_name)
    # disable auto-broadcast so the test proves bucketing (not broadcast)
    # removed the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
            "o_orderkey", "l_linenumber", "l_quantity"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_pair):
    o_name, l_name = bucketed_pair
    o, li = bucketing.read_table(spark, o_name), bucketing.read_table(spark, l_name)
    t = load_tables(spark, sf_dir)
    bucketed = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        "o_orderkey", "l_linenumber", F.col("l_quantity")
    )
    plain = t["orders"].join(
        t["lineitem"], t["orders"]["o_orderkey"] == t["lineitem"]["l_orderkey"]
    ).select("o_orderkey", "l_linenumber", "l_quantity")
    assert canonical_rows(bucketed.toPandas()) == canonical_rows(plain.toPandas())


def test_bucketed_aggregation_has_no_shuffle(spark, sf_dir, bucketed_pair):
    """groupBy on the bucket key also reuses the bucketing (no Exchange)."""
    _, l_name = bucketed_pair
    li = bucketing.read_table(spark, l_name)
    agg = li.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
