"""Plan introspection: machine-checkable summaries of physical plans.

The scale rules in README/§4 ("dims broadcast, filters pushed, one shuffle
per agg, top-k never a full sort") are only real if they're checkable. This
module turns an executed plan into a small summary dict that tests — and
operators during development — assert against, instead of eyeballing
``explain()`` output.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PlanSummary:
    n_exchanges: int
    n_broadcast_joins: int
    n_sortmerge_joins: int
    n_cartesian: int
    has_window_group_limit: bool
    has_take_ordered: bool
    pushed_filters: list[str]
    read_schemas: list[str]
    codegen_operators: int  # operators inside WholeStageCodegen spans (`*(n)`)

    @property
    def shuffle_free(self) -> bool:
        return self.n_exchanges == 0


def _plan_text(df: DataFrame, *, executed: bool = False) -> str:
    qe = df._jdf.queryExecution()
    if executed:
        # AQE finalizes the plan (and materializes codegen markers) only
        # after an action; run one if the caller asks for the final plan.
        df.collect()
    return qe.executedPlan().toString()


def summarize(df: DataFrame, *, executed: bool = False) -> PlanSummary:
    """Summarize the physical plan of ``df``.

    ``executed=True`` collects the DataFrame first so AQE's final plan (with
    runtime re-optimizations and codegen stage markers) is inspected instead
    of the initial one.
    """
    text = _plan_text(df, executed=executed)
    pushed = [
        m.group(1)
        for m in re.finditer(r"PushedFilters: \[([^\]]+)\]", text)
        if m.group(1).strip()
    ]
    return PlanSummary(
        n_exchanges=text.count("Exchange"),
        n_broadcast_joins=text.count("BroadcastHashJoin")
        + text.count("BroadcastNestedLoopJoin"),
        n_sortmerge_joins=text.count("SortMergeJoin"),
        n_cartesian=text.count("CartesianProduct"),
        has_window_group_limit="WindowGroupLimit" in text,
        has_take_ordered="TakeOrderedAndProject" in text,
        pushed_filters=pushed,
        read_schemas=re.findall(r"ReadSchema: struct<([^>]*)>", text),
        codegen_operators=len(re.findall(r"\*\(\d+\)", text)),
    )
