"""Fuzz tier 20: oracle parity on a MESSY-whitespace corpus.

The r05 advice flagged two oracles tokenizing with ``string_split(text, ' ')``
while the engine splits on ``\\s+`` — latent only because the shipped corpora
are single-spaced. A probe over a corpus with tabs, newlines, double spaces,
and leading/trailing whitespace (scripts/tokenizer_probe.py) found the class
was 24 keys wide, every tokenizing oracle in the catalog: token counts,
TF-IDF, entropy, language-ID, quality gates, shingle dedup, packing,
contamination, fuzzy name join. All now use DuckDB
``regexp_split_to_array(X, '\\s+')``, empirically bit-identical to Spark's
``split(X, '\\s+')`` on every probed corner case (leading/trailing separator
empties are KEPT by both, interior runs collapse, '' → ['']).

This test regenerates that messy corpus and asserts every tokenizing key
still hash-matches its oracle, so a testdata regeneration with realistic
whitespace can never turn these keys gate-red again.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

from etl_asana_spark import catalog
from etl_asana_spark.testing import compare_frames, duckdb_connect


@pytest.fixture(scope="module")
def probe():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "tokenizer_probe.py",
    )
    spec = importlib.util.spec_from_file_location("tokenizer_probe", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def messy_dir(probe, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("messy_sf"))
    probe.build_dir(dst)
    return dst


def test_probe_corpus_is_actually_messy(probe, messy_dir):
    # Guard the guard: if the generator ever degrades to single-space text,
    # every parity assertion below becomes vacuous.
    import duckdb

    row = duckdb.sql(
        f"""SELECT
          SUM(CASE WHEN text LIKE '%\t%' OR text LIKE '%' || chr(10) || '%'
              THEN 1 ELSE 0 END) AS multi_ws,
          SUM(CASE WHEN text LIKE '%  %' THEN 1 ELSE 0 END) AS double_sp,
          SUM(CASE WHEN text LIKE ' %' OR text LIKE '% ' THEN 1 ELSE 0 END)
              AS boundary_ws
        FROM '{messy_dir}/documents.parquet'"""
    ).fetchone()
    assert row[0] > 50 and row[1] > 50 and row[2] > 20, row


@pytest.mark.slow  # ~22 s messy-corpus sweep; opt-in (r11, see pytest.ini)
def test_tokenizing_keys_match_oracles_on_messy_corpus(spark, messy_dir):
    qs = catalog.queries()
    oracles = catalog.oracle_sql()
    keys = [
        k
        for k, sql in oracles.items()
        if "string_split(" in sql or "regexp_split_to_array(" in sql
    ]
    assert len(keys) >= 30  # the tokenizing surface; shrinkage = lost coverage
    con = duckdb_connect(messy_dir)
    failures = []
    for key in keys:
        try:
            probs = compare_frames(
                qs[key](spark, messy_dir).toPandas(),
                con.execute(oracles[key]).fetchdf(),
            )
        except Exception as exc:  # noqa: BLE001
            probs = [f"{type(exc).__name__}: {exc}"]
        if probs:
            failures.append((key, str(probs[0])[:140]))
    con.close()
    assert not failures, failures
