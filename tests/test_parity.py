"""Mirror of the driver's t2 gate: every catalog key vs its DuckDB oracle.

Oracle-less keys get the driver's weaker check (query runs, schema stable,
rows collected). Runs at sf0.001 by default; PARITY_SF_DIR bumps the scale.
"""

from __future__ import annotations

import pytest

from etl_asana_spark import catalog
from etl_asana_spark.testing import check_query

KEYS = sorted(catalog.queries())


@pytest.mark.parametrize("key", KEYS)
def test_parity(key, spark, duck, sf_dir):
    problems = check_query(spark, duck, key, sf_dir)
    assert not problems, f"{key}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"r_name", "n_name", "n_orders", "revenue"}


def test_every_query_has_callable_and_key_coverage():
    qs = catalog.queries()
    oracles = catalog.oracle_sql()
    assert set(oracles) <= set(qs), "oracle without query"
    for key, fn in qs.items():
        assert callable(fn), key


def test_every_rows_only_key_documents_why():
    """An oracle-less key gets only the driver's weak rows-only check, so
    the docstring must say WHY no SQL oracle exists (sketch estimate,
    seeded projection, binary decode, ...). Keeps the rows-only set an
    explicit, justified list — a new key can't silently skip the oracle."""
    import re

    catalog.load_all()
    markers = ("rows-only", "rows only", "no oracle", "no sql oracle",
               "no duckdb", "engine-specific")
    missing = []
    for key, fn in catalog._QUERIES.items():
        if key in catalog._ORACLES:
            continue
        doc = re.sub(r"\s+", " ", (fn.__doc__ or "")).replace("- ", "-").lower()
        if not any(m in doc for m in markers):
            missing.append(key)
    assert not missing, f"rows-only keys without a documented rationale: {missing}"
