"""Deduplication operators: exact now; fuzzy families live alongside (M7).

Exact dedup is implemented as a deterministic keep-rule (row_number over an
explicit ordering) rather than ``dropDuplicates``: at 100 TB, "an arbitrary
survivor per key" is not reproducible across runs/partitionings, and the
reference's load stage semantics (last-modified-wins upsert) need an explicit
ordering anyway. Catalyst plans this as a single hash-partitioned window —
same shuffle cost as dropDuplicates, deterministic result.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_exact(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Keep exactly one row per ``keys``: the first under ``order_by``.

    ``order_by`` must be a total order within each key group (include a
    unique column last) or the survivor is still ambiguous.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_last_modified_wins(
    df: DataFrame, key: str, modified_col: str, tiebreak: Sequence[str] = ()
) -> DataFrame:
    """Reference load-stage semantics: newest version of each key survives.

    Reconstruction of the ETL upsert (SURVEY.md §0.3 R3): rows whose
    ``modified_col`` advanced replace older versions of the same ``key``.
    """
    order = [F.col(modified_col).desc(), *[F.col(c).desc() for c in tiebreak]]
    return dedup_exact(df, [key], order)
