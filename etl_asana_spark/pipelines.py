"""End-to-end ETL pipeline — the reference's whole program, Spark-first.

A user of the reference runs: extract Asana resources → flatten to
relational tables → upsert into a store, incrementally. This module is that
program on the engine: one call wires the ingestion sources
(sources/asana.py), transforms, and partitioned sinks into the star-schema
output a downstream analyst queries.

Batch-incremental design (SURVEY §2.1 #7/#8): each run merges the new
batch into the existing store with last-modified-wins semantics keyed on
``gid``, so replays and overlapping syncs are idempotent — the property the
tests assert. At 100 TB the same topology holds: the store is a
date-partitioned parquet table, the merge is one window over the union
(shuffle on gid), and everything else is generator/projection work inside
the scan stage.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .sources import asana
from .sources.fixtures import FIXTURES_DIR, ensure_fixtures


@dataclass(frozen=True)
class EtlResult:
    """Materialized relational outputs of one sync run."""

    tasks: DataFrame              # one row per gid, newest version
    task_tags: DataFrame          # task↔tag bridge
    task_memberships: DataFrame   # task↔project/section bridge
    task_custom_fields: DataFrame # pivoted EAV columns
    checkpoint: str               # max modified_at seen (next sync token)

    def row_counts(self) -> dict[str, int]:
        return {
            "tasks": self.tasks.count(),
            "task_tags": self.task_tags.count(),
            "task_memberships": self.task_memberships.count(),
            "task_custom_fields": self.task_custom_fields.count(),
        }


def run_asana_etl(
    spark: SparkSession,
    batch_paths: list[str | Path] | None = None,
    prior_tasks: DataFrame | None = None,
) -> EtlResult:
    """One sync run: ingest every batch, merge last-modified-wins (optionally
    on top of a prior store), derive the bridge/pivot tables from the
    surviving task versions.

    Idempotent by construction: re-running with the same batches — or with
    ``prior_tasks`` = a previous run's output — yields identical tables.
    """
    if batch_paths is None:
        d = ensure_fixtures(FIXTURES_DIR)
        batch_paths = [d / "tasks_batch1.ndjson", d / "tasks_batch2.ndjson"]

    batches = [asana.read_tasks(spark, p) for p in batch_paths]
    if prior_tasks is not None:
        batches = [prior_tasks, *batches]
    merged = asana.upsert_batches(*batches)

    return EtlResult(
        tasks=merged,
        task_tags=asana.flatten_tags(merged),
        task_memberships=asana.flatten_memberships(merged),
        task_custom_fields=asana.pivot_custom_fields(merged),
        checkpoint=asana.max_modified(merged),
    )


def write_etl_outputs(result: EtlResult, out_dir: str | Path) -> None:
    """Load stage: persist the relational outputs as parquet tables.

    Scalars-only task table additionally gets the typed-coercion projection
    so downstream readers see timestamps/dates, not ISO strings."""
    from .sources.sinks import write_table

    out = Path(out_dir)
    write_table(asana.coerce_task_scalars(result.tasks), str(out / "tasks"))
    write_table(result.task_tags, str(out / "task_tags"))
    write_table(result.task_memberships, str(out / "task_memberships"))
    write_table(result.task_custom_fields, str(out / "task_custom_fields"))
