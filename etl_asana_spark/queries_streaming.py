"""Streaming catalog entries (SURVEY §2.10 #56–#62) — rows-only checks.

True streaming runs are not SQL-oracle-checkable (DuckDB cannot replay a
micro-batch timeline), so these register without oracles; the driver records
rows-only results and tests/test_streaming.py asserts the stronger property:
an AvailableNow streaming run equals its batch twin's result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import register
from .streaming import jobs


@register("q_stream_tumbling")
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#56–#58 file stream → watermark → stateful windowed agg → memory."""
    return jobs.tumbling_counts_stream(spark, sf_dir)


@register("q_stream_sliding")
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2 h / 30 min windowed agg — overlap-factor-bounded state."""
    return jobs.sliding_counts_stream(spark, sf_dir)


@register("q_stream_dedup")
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#59 dropDuplicatesWithinWatermark across micro-batches."""
    return jobs.dedup_stream(spark, sf_dir)


@register("q_stream_static_join")
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#60 stream ⋈ static dim enrichment with windowed rollup."""
    return jobs.stream_static_join(spark, sf_dir)


@register("q_stream_session")
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#62 custom stateful sessionization (applyInPandasWithState), 30-min
    gap — property-checked against batch session_window in tests."""
    return jobs.sessionize_stream(spark, sf_dir)


@register("q_stream_upsert")
def q_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#61 foreachBatch last-modified-wins upsert load (replay-idempotent)."""
    return jobs.foreach_batch_upsert(spark, sf_dir)


@register("q_stream_stream_join")
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream attribution join (views ⋈ purchases within 1 hour),
    state bounded by dual watermarks + the event-time range condition."""
    return jobs.stream_stream_join(spark, sf_dir)


@register("q_stream_source_sync")
def q_stream_source_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python streaming DataSource: the Events-API sync-token poll
    loop as a first-class readStream format (offset dict = sync token,
    checkpointed by Spark). Rows-only; totals are property-checked against
    the direct fixture read in tests/test_streaming.py."""
    return jobs.sync_token_source_stream(spark)
