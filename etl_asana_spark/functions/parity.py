"""Deterministic, engine-portable float aggregation.

Problem: ``SUM(double)`` is order-dependent; Spark sums per-partition in
shuffle order, DuckDB in its own morsel order, so at 60 k+ rows the two
engines can disagree in the low bits — fatal for a value-hash oracle, and
equally fatal for run-to-run reproducibility on a real cluster (a 100 TB job
whose revenue total changes with partitioning is not auditable).

Fix: aggregate in fixed-point. Casting each double to DECIMAL(25,6) rounds it
to a canonical 6-decimal value (both engines round the same IEEE double the
same way), and decimal addition is exact and associative — any summation
order gives bit-identical results. The final cast back to double is then a
deterministic function of a deterministic value.

This is the engine's default for money/measure sums, not just a test trick:
it is how the engine guarantees reproducible aggregates at any scale or
parallelism. Spark keeps decimal sums in whole-stage codegen (no UDF).

``dsum``/``davg`` (Spark) pair with ``sql_dsum``/``sql_davg`` (oracle SQL).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 25 integer+fraction digits, 6 fractional: exact for |x| < 1e19 with 1e-6
# resolution — covers every money/measure column in the testdata (|x| < 1e7)
# with 12 orders of magnitude of headroom for 100 TB-scale sums.
_DEC = "decimal(25,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str) -> Column:
    """Order-independent SUM over doubles (exact fixed-point accumulation)."""
    return F.sum(_c(col).cast(_DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum ÷ exact count, one fp divide."""
    return (F.sum(_c(col).cast(_DEC)).cast("double") / F.count(_c(col))).cast("double")


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) / COUNT({expr}) AS DOUBLE)"
