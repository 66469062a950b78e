"""End-to-end ETL pipeline: full-program semantics and idempotence."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from etl_asana_spark import pipelines
from etl_asana_spark.sources.fixtures import FIXTURES_DIR, N_NEW, N_TASKS
from etl_asana_spark.testing import canonical_rows


def test_etl_end_to_end_counts_and_keys(spark):
    r = pipelines.run_asana_etl(spark)
    counts = r.row_counts()
    assert counts["tasks"] == N_TASKS + N_NEW  # one row per distinct gid
    assert r.tasks.select("gid").distinct().count() == counts["tasks"]
    # bridges reference only surviving tasks
    gids = {row["gid"] for row in r.tasks.select("gid").collect()}
    assert {row["task_gid"] for row in r.task_tags.collect()} <= gids
    assert {row["task_gid"] for row in r.task_memberships.collect()} == gids
    assert counts["task_custom_fields"] == counts["tasks"]
    assert r.checkpoint >= "2024-01-20"  # batch2 modified_at dominates


def test_etl_idempotent_replay(spark):
    """Running the sync again on top of its own output changes nothing."""
    first = pipelines.run_asana_etl(spark)
    second = pipelines.run_asana_etl(spark, prior_tasks=first.tasks)
    for attr in ("tasks", "task_tags", "task_custom_fields"):
        a, b = getattr(first, attr), getattr(second, attr)
        assert canonical_rows(a.toPandas()) == canonical_rows(b.toPandas()), attr
    assert second.checkpoint == first.checkpoint


def test_etl_incremental_equals_full(spark):
    """batch1-then-batch2 incrementally == both batches at once."""
    d = FIXTURES_DIR
    full = pipelines.run_asana_etl(
        spark, [d / "tasks_batch1.ndjson", d / "tasks_batch2.ndjson"]
    )
    step1 = pipelines.run_asana_etl(spark, [d / "tasks_batch1.ndjson"])
    step2 = pipelines.run_asana_etl(
        spark, [d / "tasks_batch2.ndjson"], prior_tasks=step1.tasks
    )
    assert canonical_rows(step2.tasks.toPandas()) == canonical_rows(full.tasks.toPandas())


def test_etl_outputs_written_and_typed(spark):
    r = pipelines.run_asana_etl(spark)
    out = tempfile.mkdtemp(prefix="etl_out_")
    pipelines.write_etl_outputs(r, out)
    tasks = spark.read.parquet(f"{out}/tasks")
    assert dict(tasks.dtypes)["created_ts"] == "timestamp"
    assert tasks.count() == r.tasks.count()
    assert spark.read.parquet(f"{out}/task_tags").count() == r.task_tags.count()
