"""Spark-4 Python DataSource: the paginated Asana REST extract as a
first-class ``spark.read.format("asana_tasks")`` source.

This is the idiomatic Spark-4 expression of the reference's extract stage
(SURVEY §0.3 R1, reconstructed — the snapshot is empty): the source itself
owns pagination and filter pushdown, instead of a driver-side page loop.

- **Partitions = API pages.** ``partitions()`` plans one input partition per
  ``page_size`` slice (Asana caps ``limit`` at 100), so every executor core
  fetches its own page concurrently — the parallelism the reference's
  sequential HTTP loop never had. Offline here: each "page" replays a line
  range of the committed ndjson fixture; online, ``read()`` would GET
  ``/tasks?limit=&offset=`` with the token-bucket pacing of
  ``sources.asana.RateLimiter``.
- **Filter pushdown → API query params.** ``pushFilters`` accepts
  ``completed = <bool>`` (the analog of Asana's ``completed_since`` server
  filter) and applies it inside the page read, BEFORE rows reach Spark;
  every other predicate is handed back for Spark to evaluate. At 100 TB of
  task history the pushed filter is the difference between shipping the
  full resource and shipping the slice you asked for.

The rows this source yields are hash-checked against DuckDB ``read_json``
over the same fixture (catalog key ``q_source_datasource``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

#: Flat projection of the task resource this source serves (nested detail
#: belongs to the JSON ingest path — sources/asana.py).
TASKS_DDL = (
    "gid string, name string, completed boolean, created_at string, "
    "modified_at string, assignee_gid string, parent_gid string, "
    "num_likes bigint"
)


@dataclass
class _Page(InputPartition):
    path: str
    offset: int
    limit: int


class AsanaTasksReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.page_size = int(options.get("page_size", "100"))
        self.completed: bool | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("completed",):
                # Server-side filter: becomes an API query param online.
                self.completed = bool(f.value)
            else:
                yield f  # Spark evaluates everything we don't push.

    def partitions(self) -> list[InputPartition]:
        with open(self.path) as fh:
            total = sum(1 for _ in fh)
        return [
            _Page(self.path, off, self.page_size)
            for off in range(0, total, self.page_size)
        ]

    def read(self, partition: _Page) -> Iterator[tuple]:
        with open(partition.path) as fh:
            for i, line in enumerate(fh):
                if i < partition.offset:
                    continue
                if i >= partition.offset + partition.limit:
                    break
                t = json.loads(line)
                if self.completed is not None and t.get("completed") != self.completed:
                    continue
                assignee = t.get("assignee") or {}
                parent = t.get("parent") or {}
                yield (
                    t.get("gid"),
                    t.get("name"),
                    t.get("completed"),
                    t.get("created_at"),
                    t.get("modified_at"),
                    assignee.get("gid"),
                    parent.get("gid"),
                    t.get("num_likes"),
                )


class AsanaTasksDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "asana_tasks"

    def schema(self) -> str:
        return TASKS_DDL

    def reader(self, schema) -> AsanaTasksReader:
        return AsanaTasksReader(dict(self.options))


def register_asana_source(spark) -> None:
    """Idempotently register the format with this session.

    Also self-applies the engine confs: this path does not go through
    ``registry.load_tables`` (it reads fixtures, not sf tables), and the
    reader's ``pushFilters`` needs ``spark.sql.python.filterPushdown.enabled``
    even on a plain driver-built session.
    """
    from ..session import ensure_engine_confs

    ensure_engine_confs(spark)
    spark.dataSource.register(AsanaTasksDataSource)


#: Story/event feed projection served by the streaming source.
EVENTS_DDL = "gid string, task_gid string, created_at string, type string, text string"


class AsanaEventsStreamReader(SimpleDataSourceStreamReader):
    """Incremental sync as a STREAMING source: the offset dict is the sync
    token.

    The reference's Events-API pattern (SURVEY §0.3 R1: poll with a sync
    token, receive only changes since) is exactly Spark's streaming-offset
    contract: ``initialOffset`` = first token, ``read(start)`` = one poll
    returning (new rows, next token), ``readBetweenOffsets`` = deterministic
    replay for recovery — Spark's checkpoint persists the token, giving the
    exactly-once resume the reference would hand-roll. Offline, the token is
    a line position in the fixture feed and each poll returns at most
    ``batch_lines`` rows; online it would be the opaque Asana sync token.
    """

    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.batch_lines = int(options.get("batch_lines", "100"))

    def initialOffset(self) -> dict:
        return {"line": 0}

    def _rows(self, a: int, b: int) -> list[tuple]:
        out = []
        with open(self.path) as fh:
            for i, line in enumerate(fh):
                if i < a:
                    continue
                if i >= b:
                    break
                s = json.loads(line)
                out.append(
                    (
                        s.get("gid"),
                        s.get("task_gid"),
                        s.get("created_at"),
                        s.get("type"),
                        s.get("text"),
                    )
                )
        return out

    def read(self, start: dict):
        a = start["line"]
        rows = self._rows(a, a + self.batch_lines)
        return iter(rows), {"line": a + len(rows)}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["line"], end["line"]))


class AsanaEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "asana_events"

    def schema(self) -> str:
        return EVENTS_DDL

    def simpleStreamReader(self, schema) -> AsanaEventsStreamReader:
        return AsanaEventsStreamReader(dict(self.options))


def register_asana_stream_source(spark) -> None:
    """Idempotently register the streaming format with this session."""
    from ..session import ensure_engine_confs

    ensure_engine_confs(spark)
    spark.dataSource.register(AsanaEventsDataSource)


# ---------------------------------------------------------------------------
# The load side: a transactional upsert SINK (R3) as a Python DataSourceWriter
# ---------------------------------------------------------------------------

STORE_DDL = "gid string, name string, modified_at string, completed boolean"


@dataclass
class _Staged(WriterCommitMessage):
    path: str
    rows: int


class AsanaStoreWriter(DataSourceWriter):
    """Last-modified-wins upsert store with staged, atomic commits.

    Spark's writer contract maps exactly onto the reference's load stage,
    with the transactionality the reference lacked: each task ``write()``s
    its partition to a private staging file and reports it in a commit
    message; only the driver-side ``commit()`` — which runs iff every task
    succeeded — merges staging with the existing store (newest
    ``modified_at`` per gid wins; a tie keeps the incoming row) and
    ``os.replace``s it into place atomically. ``abort()`` deletes staging,
    leaving the store untouched: a half-failed load can never corrupt
    state. Speculative/retried tasks are safe — duplicate staged rows
    collapse in the same upsert.
    """

    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.stage_dir = self.path + ".staging"

    def write(self, iterator) -> _Staged:
        import os
        import uuid as _uuid

        os.makedirs(self.stage_dir, exist_ok=True)
        part = f"{self.stage_dir}/part-{_uuid.uuid4().hex}.ndjson"
        n = 0
        with open(part, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _Staged(part, n)

    def commit(self, messages) -> None:
        import glob
        import os

        store: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as fh:
                for line in fh:
                    t = json.loads(line)
                    store[t["gid"]] = t
        for m in messages:
            with open(m.path) as fh:
                for line in fh:
                    t = json.loads(line)
                    cur = store.get(t["gid"])
                    if cur is None or t["modified_at"] >= cur["modified_at"]:
                        store[t["gid"]] = t
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            for gid in sorted(store):
                fh.write(json.dumps(store[gid]) + "\n")
        os.replace(tmp, self.path)
        for p in glob.glob(f"{self.stage_dir}/part-*.ndjson"):
            os.unlink(p)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if os.path.exists(m.path):
                os.unlink(m.path)


class AsanaStoreDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "asana_store"

    def schema(self) -> str:
        return STORE_DDL

    def writer(self, schema, overwrite: bool) -> AsanaStoreWriter:
        return AsanaStoreWriter(dict(self.options))


def register_asana_store(spark) -> None:
    """Idempotently register the upsert-store sink with this session."""
    from ..session import ensure_engine_confs

    ensure_engine_confs(spark)
    spark.dataSource.register(AsanaStoreDataSource)
