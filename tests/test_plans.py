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
Plan inspection goes through etl_asana_spark.plans.summarize.
"""

from __future__ import annotations

from etl_asana_spark import catalog
from etl_asana_spark.plans import summarize


def _summary(spark, key: str, sf_dir: str, **kw):
    return summarize(catalog.queries()[key](spark, sf_dir), **kw)


def test_star_join_broadcasts_all_dims(spark, sf_dir):
    """orders⋈customer⋈nation⋈region: every dim side broadcast, fact never
    shuffled on a join key."""
    s = _summary(spark, "q_join_star", sf_dir)
    assert s.n_broadcast_joins == 3
    assert s.n_sortmerge_joins == 0


def test_scan_prunes_columns_and_pushes_filters(spark, sf_dir):
    s = _summary(spark, "q_scan_pruned", sf_dir)
    assert s.read_schemas, "no ReadSchema in plan"
    cols = {c.split(":")[0] for c in s.read_schemas[0].split(",")}
    assert cols == {"l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"}
    assert s.pushed_filters, "filter not pushed to parquet"


def test_group_topk_uses_window_group_limit(spark, sf_dir):
    """rank<=k filter must plan a WindowGroupLimit (partial top-k before the
    shuffle) — at scale this is the difference between shuffling k rows per
    group and shuffling the whole fact table."""
    s = _summary(spark, "q_win_topk_group", sf_dir)
    assert s.has_window_group_limit
    assert s.n_exchanges == 1  # one hash shuffle; no extra sort pass


def test_cap_per_source_also_group_limited(spark, sf_dir):
    """The corpus-curation cap claims the same plan property — hold it to it."""
    s = _summary(spark, "q_cap_per_source", sf_dir)
    assert s.has_window_group_limit


def test_global_topk_avoids_full_sort(spark, sf_dir):
    s = _summary(spark, "q_topk", sf_dir)
    assert s.has_take_ordered
    assert s.n_exchanges == 0  # no global-sort range shuffle


def test_groupby_agg_single_shuffle_partial_agg(spark, sf_dir):
    """TPC-H Q1 shape: map-side partial aggregate, exactly one exchange."""
    s = _summary(spark, "q_agg_groupby", sf_dir)
    assert s.n_exchanges == 1
    assert s.pushed_filters, "shipdate filter not pushed"


def test_whole_stage_codegen_covers_agg(spark, sf_dir):
    """The deterministic fixed-point sums must stay inside codegen (the
    `*(n)` markers in the AQE-final plan) — no interpretation fallback in
    the hot path."""
    s = _summary(spark, "q_agg_groupby", sf_dir, executed=True)
    assert s.codegen_operators >= 2  # partial + final agg stages at minimum


def test_no_cartesian_in_relational_core(spark, sf_dir):
    """Only the similarity queries may cross-join (bounded query-vector side);
    the relational core must never plan a CartesianProduct."""
    for key in ["q_join_star", "q_join_shuffle", "q_join_outer", "q_join_theta"]:
        assert _summary(spark, key, sf_dir).n_cartesian == 0, key


def test_semi_join_is_semi_not_inner_distinct(spark, sf_dir):
    """EXISTS/IN must plan a LeftSemi (streams, no dedup pass)."""
    df = catalog.queries()["q_join_semi"](spark, sf_dir)
    assert "LeftSemi" in df._jdf.queryExecution().executedPlan().toString()


def test_golden_local_volume_broadcasts_dim_chain(spark, sf_dir):
    """Q5 shape: supplier and nation⋈region must broadcast — only the
    customer⋈orders⋈lineitem fact spine may shuffle. At 100 TB a sort-merge
    against a 25-row dim would shuffle the whole fact table for nothing."""
    s = _summary(spark, "q_golden_local_volume", sf_dir)
    assert s.n_broadcast_joins >= 3  # supplier, nation, region
    assert s.n_cartesian == 0


def test_golden_disjunctive_keeps_equi_join(spark, sf_dir):
    """Q19 shape: the OR-of-ANDs must NOT degrade the join to a cartesian —
    Catalyst keeps p_partkey = l_partkey as the equi condition and evaluates
    the disjunction as a residual filter."""
    s = _summary(spark, "q_golden_disjunctive", sf_dir)
    assert s.n_cartesian == 0
    assert s.n_broadcast_joins == 1  # part broadcasts
    assert s.pushed_filters, "no predicate reached the scan"


def test_golden_waiting_suppliers_plans_semi_and_anti(spark, sf_dir):
    """Q21 shape: EXISTS → LeftSemi, NOT EXISTS → LeftAnti; never a join +
    distinct/filter rewrite (which would materialize the duplicates it
    exists to avoid)."""
    plan = (
        catalog.queries()["q_golden_waiting_suppliers"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_golden_top_supplier_scalar_max_is_broadcast(spark, sf_dir):
    """Q15 shape: the scalar max joins back as a 1-row broadcast, not a
    global sort; revenue agg shuffles exactly once per agg."""
    s = _summary(spark, "q_golden_top_supplier", sf_dir)
    assert s.n_broadcast_joins >= 1
    assert s.n_cartesian == 0


def test_gaps_islands_reuses_window_partitioning(spark, sf_dir):
    """distinct → window → groupBy: the groupBy on (custkey, anchor) must
    reuse the window's hashpartitioning(custkey) — exactly two exchanges,
    never three."""
    s = _summary(spark, "q_win_gaps_islands", sf_dir)
    assert s.n_exchanges == 2
    assert s.n_cartesian == 0


def test_null_anti_join_is_null_aware_single_column(spark, sf_dir):
    """NOT IN over a nullable probe must plan as a null-aware broadcast anti
    join (the trailing `true` flag), not a nested loop."""
    import re

    df = catalog.queries()["q_join_null_anti"](spark, sf_dir)
    text = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"BroadcastHashJoin .*LeftAnti, BuildRight, true", text), text
    assert "NestedLoop" not in text


def test_fill_forward_spine_is_broadcast_not_cartesian(spark, sf_dir):
    """users × generated-days spine: the tiny day side must broadcast; a
    CartesianProduct here would shuffle every user row per day at scale."""
    s = _summary(spark, "q_fill_forward", sf_dir)
    assert s.n_cartesian == 0
    assert s.n_broadcast_joins >= 1


def test_weighted_sample_is_take_ordered(spark, sf_dir):
    """A-ES weighted sampling must plan as TakeOrderedAndProject (partial
    k-heaps), never a global sort of the corpus."""
    s = _summary(spark, "q_sample_weighted", sf_dir)
    assert s.has_take_ordered
    assert s.n_exchanges <= 1


def test_bm25_topk_is_take_ordered(spark, sf_dir):
    """BM25 top-20 must be TakeOrderedAndProject — never a global sort of
    the scored corpus."""
    s = _summary(spark, "q_text_bm25", sf_dir)
    assert s.has_take_ordered
    assert s.n_cartesian == 0


def test_bitmap_distinct_rollup_shuffles_shrink(spark, sf_dir):
    """daily (week,day,chunk) → weekly (week,chunk) → week is three
    exchanges by necessity (coarsening keys can't reuse a finer hash
    partitioning), but only the FIRST moves row-scale data — the merges
    carry one long per bitmap. Pin the shape: three exchanges, and every
    aggregate pair is partial+final (map-side combine before each)."""
    s = _summary(spark, "q_agg_bitmap_distinct", sf_dir)
    assert s.n_exchanges == 3, s
    df = catalog.queries()["q_agg_bitmap_distinct"](spark, sf_dir)
    text = df._jdf.queryExecution().executedPlan().toString()
    assert text.count("partial_bit_or") == 2 and "partial_sum" in text


def test_supplier_variety_broadcasts_blacklist_and_parts(spark, sf_dir):
    """Q16 shape: the NOT-IN blacklist plans as a broadcast anti join and
    the filtered part dim broadcasts — the fact is never shuffled by a join
    key, only by the distinct-count aggregation."""
    s = _summary(spark, "q_golden_supplier_variety", sf_dir)
    assert s.n_broadcast_joins == 2
    assert s.n_sortmerge_joins == 0


def test_important_parts_threshold_is_broadcast(spark, sf_dir):
    """Q11 shape: the scalar 0.1% cutoff joins back as a 1-row broadcast —
    no second scan of the fact and no nested-loop anywhere."""
    s = _summary(spark, "q_golden_important_parts", sf_dir)
    assert s.n_broadcast_joins >= 2  # nation-supplier dim + threshold row
    assert s.n_cartesian == 0


def test_perplexity_prob_table_is_broadcast(spark, sf_dir):
    """The bigram-probability table is vocabulary-sized; scoring must join
    it broadcast so the corpus-side bigram stream is never shuffled by
    (w1, w2)."""
    s = _summary(spark, "q_text_perplexity", sf_dir)
    assert s.n_broadcast_joins >= 1
    assert s.n_sortmerge_joins == 0


def test_spearman_rank_tables_broadcast_no_global_sort(spark, sf_dir):
    """Spearman must rank via the value-frequency CDF: tiny rank tables
    broadcast onto the fact, and no global row_number sort of the fact
    (the plan has no single-partition Exchange)."""
    s = _summary(spark, "q_agg_spearman", sf_dir)
    assert s.n_broadcast_joins == 2
    assert s.n_sortmerge_joins == 0


def test_anomaly_mad_statistics_broadcast(spark, sf_dir):
    """Both per-type statistics (median, MAD) rejoin the daily rollup as
    broadcasts — the events fact is scanned once and never shuffled by a
    join key."""
    s = _summary(spark, "q_anomaly_mad", sf_dir)
    # the dev subtree (daily ⋈ broadcast med) appears on both sides of the
    # mad join, so its broadcast counts twice, plus the mad broadcast = 3
    assert s.n_broadcast_joins == 3
    assert s.n_sortmerge_joins == 0


def test_dpp_scan_plants_dynamic_pruning_filter(spark, sf_dir):
    """q_scan_dpp: the fact scan's PartitionFilters must carry a
    dynamicpruning subquery (runtime directory pruning from the dim side),
    and the result must cover only qualifying statuses."""
    from etl_asana_spark.plans import _plan_text

    df = catalog.queries()["q_scan_dpp"](spark, sf_dir)
    text = _plan_text(df, executed=False)
    assert "dynamicpruning" in text, text[:2000]
    rows = df.collect()
    assert 1 <= len(rows) <= 3  # only above-average statuses survive


def test_vocab_oov_broadcasts_limit_bounded_vocab(spark, sf_dir):
    """q_text_vocab_oov: the vocab side is TakeOrderedAndProject (top-200,
    never a full sort) and joins back by broadcast — scoring adds no
    shuffle beyond the per-doc aggregation."""
    from etl_asana_spark.plans import _plan_text

    df = catalog.queries()["q_text_vocab_oov"](spark, sf_dir)
    text = _plan_text(df, executed=False)
    assert "TakeOrderedAndProject" in text
    assert "BroadcastHashJoin" in text
    assert "SortMergeJoin" not in text


def test_dsir_scoring_join_is_broadcast(spark, sf_dir):
    """q_dsir_weights: the per-token ratio table is vocabulary-sized and
    broadcast; the fact-side token stream is never shuffled for the join."""
    from etl_asana_spark.plans import _plan_text

    df = catalog.queries()["q_dsir_weights"](spark, sf_dir)
    text = _plan_text(df, executed=False)
    assert "BroadcastHashJoin" in text
    assert "SortMergeJoin" not in text


def test_bucketed_join_reads_colocated_buckets(spark, sf_dir):
    """q_join_bucketed: after the bucketed write, the (shuffle-family) join
    plans with NO exchange on the join key — both scans read co-located
    buckets. At test scale Spark would prefer broadcasting the small side,
    which also avoids the shuffle but doesn't exercise bucketing, so the
    broadcast threshold is disabled for the assertion."""
    from etl_asana_spark.plans import _plan_text

    key = "spark.sql.autoBroadcastJoinThreshold"
    before = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        df = catalog.queries()["q_join_bucketed"](spark, sf_dir)
        text = _plan_text(df, executed=False)
    finally:
        spark.conf.set(key, before)
    assert "Bucketed: true" in text
    join_idx = min(
        i for i in (
            text.find("SortMergeJoin"), text.find("ShuffledHashJoin"),
        ) if i >= 0
    )
    # Plans print root-first, so the join's INPUT subtree is the text after
    # the join line. The only hash exchange allowed is the post-join
    # aggregation (above the join); the join inputs come straight from the
    # co-located bucketed scans with no exchange.
    input_subtree = text[join_idx:]
    assert "Exchange hashpartitioning" not in input_subtree


def test_group_topk_exchange_first_branch_drops_partial(spark, sf_dir, monkeypatch):
    """r10: topk_per_group's exchange-first strategy (chosen when the
    map-side partial heap cannot filter — avg_group_rows <= k x scan
    partitions, the 100 TB shape) must plan a REPARTITION_BY_COL exchange
    with NO partial WindowGroupLimit / map-side sort, keep the FINAL heap,
    and return exactly the declarative plan's rows."""
    from pyspark.sql import functions as F

    from etl_asana_spark.operators import topk as T
    from etl_asana_spark.registry import load_tables

    orders = load_tables(spark, sf_dir)["orders"].select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    order_cols = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    # At test scale the table is a ~single-partition scan with ~10-row
    # groups: the partial heap IS worth it and the decision must say so.
    assert T.partial_limit_pays(orders, ["o_custkey"], 3)

    a = T.topk_per_group(orders, ["o_custkey"], order_cols, 3)
    plan_a = a._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan_a

    monkeypatch.setattr(T, "partial_limit_pays", lambda *args, **kw: False)
    b = T.topk_per_group(orders, ["o_custkey"], order_cols, 3)
    plan_b = b._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_COL" in plan_b
    assert "Partial" not in plan_b          # no map-side heap, no map-side sort
    assert "WindowGroupLimit" in plan_b     # final heap retained

    rows = lambda df: sorted(tuple(r) for r in df.collect())
    assert rows(a) == rows(b)


def test_group_stats_probe_memoizes_and_resets(spark, sf_dir):
    """The group-shape probe must hit its cache under a stats_key (one job
    per (table, group) pair, the 100 TB contract) and drop entries on
    reset."""
    from etl_asana_spark.operators import topk as T
    from etl_asana_spark.registry import load_tables

    orders = load_tables(spark, sf_dir)["orders"]
    key = "test-topk-stats"
    T.reset_group_stats_cache(key)
    shape = T._group_shape(orders, ["o_custkey"], key)
    assert shape[0] > 0 and shape[1] > 0 and shape[2] > 0
    assert T._GROUP_STATS[(key, ("o_custkey",))] == shape
    # Cache hit: a poisoned entry is returned verbatim (no re-probe).
    T._GROUP_STATS[(key, ("o_custkey",))] = (1, 1, 1)
    assert T._group_shape(orders, ["o_custkey"], key) == (1, 1, 1)
    assert T.reset_group_stats_cache(key) == 1
    assert (key, ("o_custkey",)) not in T._GROUP_STATS


def test_partial_limit_pays_cache_hit_touches_no_spark_api():
    """r11: on a memoized stats_key hit, partial_limit_pays must not touch
    the DataFrame at all — in particular not df.rdd, whose per-call
    physical-plan compile was the r10 q_win_topk_group bench regression
    (driver 0.54 -> 0.89 s per construction)."""
    from etl_asana_spark.operators import topk as T

    class Boom:
        """Any attribute access (df.agg, df.rdd, ...) fails the test."""

        def __getattribute__(self, name):
            raise AssertionError(f"cache hit touched DataFrame.{name}")

    key = "test-topk-cache-hit"
    T.reset_group_stats_cache(key)
    # Shape where the partial pays (10 rows/group, 1 partition, k=3) and
    # one where it does not (1 row/group over 32 partitions).
    T._GROUP_STATS[(key, ("g",))] = (1000, 100, 1)
    assert T.partial_limit_pays(Boom(), ["g"], 3, stats_key=key) is True
    T._GROUP_STATS[(key, ("g",))] = (1000, 1000, 32)
    assert T.partial_limit_pays(Boom(), ["g"], 3, stats_key=key) is False
    assert T.reset_group_stats_cache(key) == 1


def test_group_stats_probe_rejects_empty_key(spark, sf_dir):
    """r10 review: an empty stats_key must raise (the Lloyd cache rule),
    not silently disable memoization."""
    import pytest

    from etl_asana_spark.operators import topk as T
    from etl_asana_spark.registry import load_tables

    orders = load_tables(spark, sf_dir)["orders"]
    with pytest.raises(ValueError, match="stats_key"):
        T.topk_per_group(
            orders.select("o_custkey", "o_orderkey"),
            ["o_custkey"],
            [orders.o_orderkey.asc()],
            3,
            stats_key="",
        )
