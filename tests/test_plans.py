"""Physical-plan regression tests — the 100 TB posture, asserted.

Correctness says what a query returns; these tests pin HOW it executes.
Each property below is the difference between a plan that survives a 100×
scale-up and one that melts:

- dimension joins must be broadcast (no shuffle of the fact side by dim keys);
- scans must prune columns and push predicates into the parquet reader;
- per-group top-k must use WindowGroupLimit (partial limit before shuffle),
  global top-k must use TakeOrderedAndProject (never a full sort);
- single-pass aggregations must have exactly one shuffle.

If a refactor regresses one of these, the query still passes parity at
sf0.01 — only these tests catch the quietly-catastrophic plan change.
"""

from __future__ import annotations

import re

import pytest

from etl_asana_spark import catalog


def _plan(spark, key: str, sf_dir: str) -> str:
    df = catalog.queries()[key](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_star_join_broadcasts_all_dims(spark, sf_dir):
    """orders⋈customer⋈nation⋈region: every dim side broadcast, fact never
    shuffled on a join key."""
    plan = _plan(spark, "q_join_star", sf_dir)
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan
    # the only exchanges are the 3 broadcasts + the agg/sort shuffles
    assert "hashpartitioning(o_custkey" not in plan


def test_scan_prunes_columns_and_pushes_filters(spark, sf_dir):
    plan = _plan(spark, "q_scan_pruned", sf_dir)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"}
    assert re.search(r"PushedFilters: \[[^\]]", plan), "filter not pushed to parquet"


def test_group_topk_uses_window_group_limit(spark, sf_dir):
    """rank<=k filter must plan a WindowGroupLimit (partial top-k before the
    shuffle) — at scale this is the difference between shuffling k rows per
    group and shuffling the whole fact table."""
    plan = _plan(spark, "q_win_topk_group", sf_dir)
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange") == 1  # one hash shuffle; no extra sort pass


def test_global_topk_avoids_full_sort(spark, sf_dir):
    plan = _plan(spark, "q_topk", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global-sort shuffle


def test_groupby_agg_single_shuffle_partial_agg(spark, sf_dir):
    """TPC-H Q1 shape: map-side partial aggregate, exactly one exchange."""
    plan = _plan(spark, "q_agg_groupby", sf_dir)
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") == 2  # partial + final
    assert re.search(r"PushedFilters: \[[^\]]", plan), "shipdate filter not pushed"


def test_semi_join_is_semi_not_inner_distinct(spark, sf_dir):
    """EXISTS/IN must plan a LeftSemi (streams, no dedup pass)."""
    plan = _plan(spark, "q_join_semi", sf_dir)
    assert "LeftSemi" in plan


def test_whole_stage_codegen_covers_agg(spark, sf_dir):
    """The deterministic fixed-point sums must stay inside codegen — a
    WholeStageCodegen span containing the HashAggregate proves no
    interpretation fallback crept into the hot path. (AQE only materializes
    codegen spans in the final plan, so execute before inspecting.)"""
    df = catalog.queries()["q_agg_groupby"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # codegen'd operators carry the `*(stageId)` prefix in the tree string
    assert re.search(r"\*\(\d+\) HashAggregate", plan), plan[:1500]


def test_no_cartesian_in_relational_core(spark, sf_dir):
    """Only the similarity queries may cross-join (bounded query-vector side);
    the relational core must never plan a CartesianProduct."""
    for key in ["q_join_star", "q_join_shuffle", "q_join_outer", "q_join_theta"]:
        plan = _plan(spark, key, sf_dir)
        assert "CartesianProduct" not in plan, key
