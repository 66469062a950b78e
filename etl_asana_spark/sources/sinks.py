"""File sinks (SURVEY §2.1 #9, R3) — partitioned, format-pluggable writes.

The reference's load stage appends flat files / upserts a SQL store; the
Spark-first form is columnar parquet partitioned by a pruning key. The
partition layout is the 100 TB read-side contract: a date-partitioned events
table turns any time-range query into a directory prune (``PartitionFilters``
in the scan, verified in tests/test_sinks.py) instead of a full scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_engine_confs


def write_table(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "parquet",
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet/json/csv, optionally hive-partitioned.

    Notes for scale: callers should partition by a low-cardinality pruning
    key (event date, not event id — millions of tiny directories are their
    own pathology) and let AQE coalescing keep file counts sane."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def write_events_by_day(events: DataFrame, path: str) -> None:
    """events → parquet partitioned by event date (the canonical layout for
    a time-series fact table: time-range scans prune directories)."""
    write_table(
        events.withColumn("event_date", F.to_date("ts")),
        path,
        partition_by=["event_date"],
    )


def read_back(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    ensure_engine_confs(spark)
    return spark.read.format(fmt).load(path)
