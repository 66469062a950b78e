"""Local mirror of the driver's correctness gate (SURVEY.md §5.1).

Runs a catalog query on Spark and its oracle on DuckDB over the same parquet
directory, then compares row count + schema-insensitive, order-insensitive
values — the same contract the driver's value-hash enforces, but with
readable diffs. Used by tests/test_parity.py at sf0.001 (fast) and on demand
at sf0.01 (the driver's actual gate scale).
"""

from __future__ import annotations

import math
from typing import Any

import pandas as pd

from .registry import TABLE_NAMES


def duckdb_connect(sf_dir: str):
    """DuckDB connection with the driver's ten table views registered.

    A table may be a single parquet FILE (the driver's testdata shape) or a
    DIRECTORY of part files (how Spark itself — and any 100 TB-scale writer —
    lays tables out); directories are registered through a glob so the oracle
    reads the same multi-file tables the engine does.
    """
    import os

    import duckdb

    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = f"{sf_dir}/{name}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon_cell(v: Any) -> Any:
    """Canonicalize one cell for order-insensitive comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        return None if math.isnan(v) else v
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return tuple(_canon_cell(x) for x in v.tolist())
        if isinstance(v, np.generic):
            return _canon_cell(v.item())
    except ImportError:
        pass
    if isinstance(v, pd.Timestamp):
        return v.to_datetime64().astype("datetime64[us]").item()
    if v is pd.NaT:
        return None
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    """Columns sorted by name, every cell canonicalized, rows sorted.

    Cells are extracted COLUMN-WISE (``Series.tolist``), never via
    ``iterrows``: iterrows materializes each row as a Series with one common
    dtype, so a frame mixing int64 and float64 columns upcasts every int
    cell to float — which silently masked int-vs-float column drift (the
    external gate's r02 hash-red class) whenever any float column was
    present. Column-wise extraction preserves each column's kind."""
    cols = sorted(pdf.columns)
    col_vals = [[_canon_cell(v) for v in pdf[c].tolist()] for c in cols]
    rows = [tuple(vals[i] for vals in col_vals) for i in range(len(pdf))]
    return sorted(rows, key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))


def compare_frames(
    actual: pd.DataFrame, expected: pd.DataFrame, float_atol: float = 0.0
) -> list[str]:
    """Return a list of human-readable problems (empty == parity)."""
    problems: list[str] = []
    a_cols, e_cols = sorted(actual.columns), sorted(expected.columns)
    if a_cols != e_cols:
        problems.append(f"column names differ: spark={a_cols} oracle={e_cols}")
        return problems
    if len(actual) != len(expected):
        problems.append(f"row count differs: spark={len(actual)} oracle={len(expected)}")
    a_rows, e_rows = canonical_rows(actual), canonical_rows(expected)
    n_bad = 0
    for i, (ar, er) in enumerate(zip(a_rows, e_rows)):
        if _rows_strict_equal(ar, er):
            continue
        if float_atol and _rows_close(ar, er, float_atol):
            continue
        n_bad += 1
        if n_bad <= 3:
            problems.append(f"row {i}: spark={ar!r} oracle={er!r}")
    if n_bad > 3:
        problems.append(f"... {n_bad} mismatched rows total of {len(a_rows)}")
    return problems


def _rows_strict_equal(a: tuple, b: tuple) -> bool:
    """Driver-hash-strict row equality: numeric == is not enough — an int
    cell never equals a float cell (134 vs 134.0 hash differently in the
    external gate: the round-2 q_cumulative_uniques lesson), and bool never
    equals int despite bool being an int subclass. Mirrors
    scripts/sweep.py's dtype-strict compare at the testing layer so
    tests/test_parity.py can't pass what the gate would hash red."""
    import decimal

    if len(a) != len(b):
        return False
    numeric = (int, float, decimal.Decimal)
    for x, y in zip(a, b):
        if isinstance(x, bool) != isinstance(y, bool):
            return False
        if isinstance(x, numeric) and isinstance(y, numeric):
            # kind-strict: int vs float vs Decimal all hash differently in
            # the gate even when numerically equal (Decimal('1.5') == 1.5)
            if type(x) is not type(y):
                return False
        if isinstance(x, tuple) and isinstance(y, tuple):
            if not _rows_strict_equal(x, y):
                return False
            continue
        if x != y:
            return False
    return True


def _rows_close(a: tuple, b: tuple, atol: float) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x == y:
            continue
        if isinstance(x, float) and isinstance(y, float) and abs(x - y) <= atol:
            continue
        return False
    return True


def check_query(spark, con, key: str, sf_dir: str) -> list[str]:
    """Run one catalog key on both engines and diff (driver-t2 mirror)."""
    from . import catalog

    df = catalog.queries()[key](spark, sf_dir)
    pdf = df.toPandas()
    # The driver canonicalizes EVERY key's frame (pandas ``sort_values`` over
    # all columns) before hashing — rows-only keys included. An output column
    # holding ndarray/list cells crashes that sort (the r03 ``q_multimodal``
    # gate red); reproduce the crash here so no registered key can ship an
    # unhashable output schema again.
    try:
        pdf[sorted(pdf.columns)].sort_values(by=sorted(pdf.columns))
    except Exception as exc:  # noqa: BLE001
        return [f"driver-canonicalization would crash: {type(exc).__name__}: {exc}"]
    sql = catalog.oracle_sql().get(key)
    if sql is None:
        return [] if len(pdf) >= 0 else ["unreachable"]
    expected = con.execute(sql).fetchdf()
    return compare_frames(pdf, expected)
