"""Slowly-changing-dimension (type 2) history builder.

Turns an append-only change feed (key, attribute, event-time) into validity
intervals: one row per distinct state run, with ``valid_from`` / ``valid_to``
bounds and an ``is_current`` flag — the standard warehouse shape for
"what was this entity's state at time T" joins (which then resolve as as-of
joins against the interval table, see operators/joins.py).

Scale notes: both windows partition by the entity key, so the whole build is
ONE hash exchange on the key reused by two window passes; no self-join, no
driver-side iteration. State runs are detected with lag() (change filter)
before lead() assigns interval ends, so consecutive duplicate states collapse
into one interval — at 100 TB the output is proportional to the number of
CHANGES, not the number of observations.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key: str,
    state_col: str,
    ts_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Build SCD2 validity intervals from an observation feed.

    ``tiebreak`` columns make the event ordering total when ``ts_col`` can
    tie within a key (determinism discipline: never let a window order be
    ambiguous).
    """
    order: list[Column] = [F.col(ts_col)] + [F.col(c) for c in tiebreak]
    w = Window.partitionBy(key).orderBy(*order)
    changes = (
        df.withColumn("_prev", F.lag(state_col).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(state_col)))
        .drop("_prev")
    )
    w2 = Window.partitionBy(key).orderBy(*order)
    return changes.select(
        F.col(key),
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )
