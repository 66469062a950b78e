"""Query catalog — the engine's declarative operator surface.

Every operator from SURVEY.md §2 registers here as a named query:

    @register("q_join_broadcast", oracle="SELECT ...")
    def q_join_broadcast(spark, sf_dir): ...

``queries()`` / ``oracle_sql()`` (re-exported by ``__spark_entry__.py``) are
the driver's correctness gate: each Spark result is hash-compared against the
DuckDB oracle at sf0.01. Keys registered without an oracle get the driver's
weaker rows-only check (approximate / streaming / non-SQL-expressible ops).

Parity rules baked into every registered query (SURVEY.md §5.2):
- every computed column is aliased identically in the Spark plan and the SQL;
- double aggregations go through the decimal-exact helpers in
  ``functions.parity`` so results are order-independent and bit-identical
  across engines;
- oracle SQL stays in the dialect subset DuckDB and Spark share.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

#: Modules that register queries on import (order = SURVEY §7 milestones).
_QUERY_MODULES = (
    "etl_asana_spark.queries_core",
    "etl_asana_spark.queries_window",
    "etl_asana_spark.queries_functions",
    "etl_asana_spark.queries_events",
    "etl_asana_spark.queries_udx",
    "etl_asana_spark.queries_llm",
    "etl_asana_spark.queries_ingest",
    "etl_asana_spark.queries_golden",
    "etl_asana_spark.queries_golden2",
    "etl_asana_spark.queries_scale",
    "etl_asana_spark.queries_streaming",
)


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under its SURVEY §2 key, optionally with DuckDB oracle SQL."""

    def decorator(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return decorator


def load_all() -> None:
    """Import every query module (idempotent)."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as exc:
            # Tolerate not-yet-written milestone modules during the build.
            if exc.name and exc.name.startswith("etl_asana_spark"):
                continue
            raise


def queries() -> dict[str, QueryFn]:
    load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    load_all()
    return dict(_ORACLES)
