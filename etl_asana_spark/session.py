"""SparkSession factory and session-level configuration.

Why these configs (SURVEY.md §1.2, §4, memory of probe sessions):

- ``spark.sql.session.timeZone=UTC`` — the testdata timestamps are UTC
  instants; DuckDB (the correctness oracle) is timezone-naive-UTC. Pinning the
  session TZ makes Spark↔DuckDB timestamp parity exact.
- ``spark.sql.legacy.parquet.nanosAsLong=true`` — ``events.parquet`` stores
  ``ts`` as physical INT64 TIMESTAMP(NANOS); Spark 4 raises
  ``PARQUET_TYPE_ILLEGAL`` without this flag. With it, ``ts`` arrives as a
  LongType of nanoseconds; the registry converts to a real timestamp once
  (see ``registry.load_tables``).
- AQE on (+ skew-join handling) — at the 100 TB design point, runtime
  re-planning from shuffle statistics (coalescing post-shuffle partitions,
  splitting skewed partitions, demoting to broadcast when a side turns out
  small) is the first line of defense; it costs nothing at test scale.
- Arrow on — every pandas interchange (createDataFrame/toPandas, pandas UDFs,
  applyInPandas/mapInPandas) moves via Arrow columnar batches instead of
  pickled rows.

The driver may hand us an already-built session; ``ensure_engine_confs``
applies the runtime-settable subset to any session, so engine code never
depends on who constructed the session.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: SQL confs that are runtime-settable (safe on a session we didn't build).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet pushdown/pruning are on by default; stated here as contract.
    "spark.sql.parquet.filterPushdown": "true",
    # Python DataSource filter pushdown (sources/datasource.py): lets a
    # custom source turn Spark predicates into API-side query params.
    "spark.sql.python.filterPushdown.enabled": "true",
    # ANSI mode is the Spark 4 default; engine code uses try_* on any
    # fallible cast/arithmetic rather than disabling ANSI (SURVEY §7 hard-part 3).
}


def ensure_engine_confs(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable confs to an existing session."""
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # A conf may be static in exotic deployments; engine code only
            # hard-requires nanosAsLong + timeZone, both dynamic in Spark 4.
            pass
    try:
        # If the caller left Spark's stock 200 shuffle partitions, right-size
        # to the machine: at test scale 200 tiny partitions is scheduling
        # overhead; on a cluster an operator sets this (or AQE coalesces).
        # An explicit non-default caller value is respected.
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 8),
            )
    except Exception:
        pass
    return spark


def default_parallelism(spark: SparkSession) -> int:
    return spark.sparkContext.defaultParallelism


def build_session(
    app_name: str = "etl_asana_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (fallback
    ``local[*]``) so tests and bench share one code path. On a real cluster
    the caller passes no master and spark-submit decides.

    ``shuffle_partitions`` defaults to the core count in local mode — at
    sf0.1-scale data a 200-partition shuffle is pure scheduling overhead; on
    a 1000-executor cluster the operator would instead size this to
    ~2-3× total cores (or rely on AQE coalescing from a high initial value).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    if shuffle_partitions is None:
        try:
            shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)
        except ValueError:
            shuffle_partitions = os.cpu_count() or 8
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    builder = builder.config("spark.ui.enabled", "false")
    for key, value in (extra_confs or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    # getOrCreate may have returned a pre-existing session: re-assert runtime confs.
    return ensure_engine_confs(spark)
