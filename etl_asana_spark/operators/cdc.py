"""Change-data-capture apply: merge an I/U/D change feed into a snapshot.

The warehouse MERGE primitive Spark's DataFrame API lacks (it lives in table
formats like Delta/Iceberg), expressed as one full-outer join:

    base  ──┐
            ├── full_outer on key ──> decide per key ──> new snapshot
    feed  ──┘

- key only in base            → unchanged row passes through
- latest change op = 'D'      → row dropped (tombstone)
- latest change op = 'U'/'I'  → change payload wins (full-row images)

Scale notes: one shuffle on the key for the join (plus one window pass over
the FEED ONLY when ``ts_col`` is given — the feed is the small side in any
sane CDC cycle, so latest-change dedup never touches the snapshot). Both
sides stay JVM-side; with base and feed bucketed on the key the join is
shuffle-free. Replay-idempotent: applying the same feed twice yields the
same snapshot, the property tests/test_maintenance.py asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(
    base: DataFrame,
    feed: DataFrame,
    key: str,
    *,
    op_col: str = "op",
    ts_col: str | None = None,
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """Apply ``feed`` (full-row images + ``op_col`` in {'I','U','D'}) to
    ``base``; returns the new snapshot with ``base``'s schema.

    When ``ts_col`` is given, only the newest change per key applies
    (ordered by ``ts_col`` then ``tiebreak`` for a total order).
    """
    payload = [c for c in base.columns]
    latest = feed
    if ts_col is not None:
        order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak]
        w = Window.partitionBy(key).orderBy(*order)
        latest = (
            feed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    b = base.select(F.col(key).alias("_bk"), F.struct(*payload).alias("_b"))
    c = latest.select(
        F.col(key).alias("_ck"),
        F.col(op_col).alias("_op"),
        F.struct(*payload).alias("_c"),
    )
    return (
        b.join(c, F.col("_bk") == F.col("_ck"), "full_outer")
        .filter(F.col("_op").isNull() | (F.col("_op") != F.lit("D")))
        .select(F.coalesce(F.col("_c"), F.col("_b")).alias("_r"))
        .select("_r.*")
    )
