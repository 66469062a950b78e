"""Adaptive top-k-per-group: choose the physical strategy from data shape.

Catalyst executes ``row_number().over(partitionBy(g).orderBy(o)) <= k`` with
a WindowGroupLimit pair: a PARTIAL top-k heap on each MAP-side input
partition (behind a full map-side sort), then the exchange, then the FINAL
heap + rank. Whether the partial phase pays is purely a data-shape question:

- It filters a group's rows down to k **per input partition**, so it only
  removes anything when a group has MORE than k rows inside one scan
  partition — i.e. when ``avg_group_rows / n_scan_partitions > k``.
- When groups are small or the scan is wide (the 100 TB norm: avg 10 rows
  per customer over ~800k scan partitions), the partial keeps everything
  and the map-side sort is pure overhead. Measured at a 100× sf0.1
  rehearsal (15M orders, 1.5M customers, 30 scan partitions): the stock
  plan pays a full sort of every 500k-row scan partition to filter ~0 rows
  — 32.3 s; exchanging FIRST (which drops the partial but keeps the final
  heap) runs 6.5 s. At sf0.1 the same table is ONE scan partition, the
  partial is exact top-3 (3× shuffle-volume cut) and the stock plan wins
  0.45 s vs 0.96 s. Neither strategy dominates — the shape decides.

The decision inputs are one memoized probe job per (table, group) pair:
``count(*)`` + ``approx_count_distinct(group)`` (a single partial-agg scan
of the group column), plus the scan partition count Spark already knows.
At 100 TB the probe is one cheap column scan vs a misplanned full-table
map-side sort; on a lakehouse the same numbers come free from table stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Memoized (n_rows, ndv_group, n_scan_partitions) probe results. Keyed by
#: caller-supplied ``stats_key`` (same contract as the Lloyd model cache:
#: pass one only for deterministic snapshot inputs; see
#: reset_group_stats_cache). The partition count is memoized alongside the
#: probe because reading it (``df.rdd.getNumPartitions()``) compiles the
#: full physical plan — paying that per query CONSTRUCTION regressed the
#: r10 gate bench 0.54 → 0.89 s while buying nothing (the count is a
#: function of the same snapshot input the probe is keyed on).
_GROUP_STATS: dict[tuple, tuple[int, int, int]] = {}


def reset_group_stats_cache(stats_key: str | None = None) -> int:
    """Invalidate memoized group-shape probes (all, or one stats_key's)."""
    if stats_key is None:
        n = len(_GROUP_STATS)
        _GROUP_STATS.clear()
        return n
    doomed = [k for k in _GROUP_STATS if k[0] == stats_key]
    for k in doomed:
        del _GROUP_STATS[k]
    return len(doomed)


def _group_shape(
    df: DataFrame, group_cols: list[str], stats_key: str | None
) -> tuple[int, int, int]:
    """(n_rows, approx ndv of the group key, n_scan_partitions) — one
    partial-agg scan job plus one plan compile for the partition count,
    memoized together under (stats_key, group_cols) when a key is given.
    With ``stats_key=None`` both run on EVERY call (at DataFrame
    construction time) — fine for ad-hoc use, but repeated callers should
    pass a key. An empty string is rejected (it would silently disable
    memoization while looking like an opt-in — the Lloyd cache rule)."""
    if stats_key is not None and not stats_key:
        raise ValueError("stats_key must be non-empty or None")
    cache_key = (stats_key, tuple(group_cols)) if stats_key else None
    if cache_key is not None and cache_key in _GROUP_STATS:
        return _GROUP_STATS[cache_key]
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(F.struct(*group_cols)).alias("g"),
    ).collect()[0]
    shape = (
        int(row["n"]),
        max(1, int(row["g"])),
        max(1, df.rdd.getNumPartitions()),
    )
    if cache_key is not None:
        _GROUP_STATS[cache_key] = shape
    return shape


def partial_limit_pays(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    stats_key: str | None = None,
) -> bool:
    """True iff the map-side partial top-k heap would actually filter rows:
    ``avg_group_rows > k × n_scan_partitions`` (a group must exceed k rows
    inside a single input partition for the heap to drop anything). On a
    memoized stats_key hit this touches no Spark API at all — in
    particular not ``df.rdd``, whose logical→physical compile per call was
    the r10 q_win_topk_group bench regression."""
    n_rows, ndv, n_parts = _group_shape(df, group_cols, stats_key)
    return (n_rows / ndv) > float(k) * n_parts


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rk",
    stats_key: str | None = None,
) -> DataFrame:
    """Rank-filter top-k rows per group, picking the exchange placement
    from the measured group shape (module docstring).

    Both strategies produce identical rows (same window, same rank filter);
    only the physical plan differs:

    - partial pays → the declarative plan: Catalyst inserts the map-side
      partial WindowGroupLimit, cutting shuffle volume up to rows→k·groups.
    - partial wastes → ``repartition(group)`` FIRST: the explicit exchange
      satisfies the window's required distribution, Catalyst skips the
      partial (no map-side sort) but still applies the FINAL heap after the
      post-shuffle sort. Number-free repartition, so AQE stays free to
      size the exchange (REPARTITION_BY_COL is coalescible).
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    src = (
        df
        if partial_limit_pays(df, group_cols, k, stats_key=stats_key)
        else df.repartition(*group_cols)
    )
    return src.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
