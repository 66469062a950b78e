"""etl_asana_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine providing the query and data-processing
capabilities of the reference ETL tool (``pembo13/etl-asana``; snapshot at
/root/reference was delivered empty — see SURVEY.md §0, so capabilities are
reconstructed from the public Asana API surface + the driver contract), plus
the LLM-data-pipeline operator set (dedup, similarity search, multimodal
columns, text analysis) mandated by the north star (BASELINE.json).

Architecture (SURVEY.md §7):
- ``session``   — SparkSession factory: UTC, AQE, Arrow, nanos-parquet compat.
- ``registry``  — table registry over the driver's parquet testdata; applies
                  the events.ts nanosecond→microsecond normalization exactly
                  once, so no query ever sees the raw long.
- ``catalog``   — declarative registry mapping query keys → (DataFrame
                  builder, DuckDB oracle SQL); the driver contract surface.
- ``operators`` — composed relational/LLM operators (as-of join, dedup
                  families, similarity search, text analysis).
- ``functions`` — column-expression helpers (vector math, text metrics,
                  decimal-exact float aggregation).
- ``sources``   — parquet/JSON/REST(paginated, offline-replayable) sources.
- ``plans``     — physical-plan introspection & 100 TB posture checks.
- ``streaming`` — Structured Streaming jobs over the events stream.

Everything is DataFrame-first: logical plans are declared via the DataFrame /
SQL API and Catalyst/Tungsten pick the physical strategy; Python UDFs appear
only where built-ins cannot express the semantics (and then Arrow-batched).
"""

__version__ = "0.1.0"
