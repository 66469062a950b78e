"""Bucketed tables — co-located joins without a shuffle (SURVEY §4, §7 rule 6).

At 100 TB the dominant cost of a fact⋈fact equi-join is shuffling both sides
on the key. Bucketing pre-shuffles ONCE at write time: both tables are
written in N buckets by the join key (same N, same key), so every join or
aggregation on that key reads co-located buckets and Catalyst drops the
Exchange entirely — verified by tests/test_bucketing.py asserting the joined
plan has no shuffle on the bucketed key.

Spark bucketing needs a catalog table (bucket metadata lives in the
catalog, not the parquet footer), so these helpers wrap ``saveAsTable`` with
an explicit external ``path``. On a cluster the same code points at the
shared metastore; in tests the session catalog is enough.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_engine_confs


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    *,
    bucket_by: Sequence[str],
    n_buckets: int,
    sort_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) catalog table.

    ``sort_by`` the same key upgrades shuffle-free joins to merge joins with
    no sort step either. ``n_buckets`` must match across tables meant to
    co-join; pick it like shuffle partitions (≈ data size / target
    partition size), it is fixed at write time."""
    writer = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    ensure_engine_confs(spark)
    return spark.table(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
