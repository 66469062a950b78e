"""Hostile integer-key parity: the portable sketch oracles on NEGATIVE ids.

The r06 review found a latent divergence class: the portable HLL/CMS engine
sides reduce keys with Spark's ``pmod`` (always non-negative) while a naive
DuckDB ``%`` takes the dividend's sign — identical only while every fixture
user_id is non-negative. The oracles now use ``((k % P) + P) % P``; this
tier rebuilds events with negative, huge, and boundary user_ids interleaved
and asserts the three sketch keys still hash-match their oracles.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_asana_spark import catalog
from etl_asana_spark.testing import compare_frames, duckdb_connect

KEYS = ("q_agg_approx_cd", "q_agg_hll_rollup", "q_agg_cms_topk")


@pytest.fixture(scope="module")
def negative_ids_dir(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("neg_ids_sf"))
    for name in os.listdir(src):
        if name != "events.parquet":
            shutil.copy(f"{src}/{name}", f"{dst}/{name}")
    t = pq.read_table(f"{src}/events.parquet")
    uids = t["user_id"].to_pylist()
    hostile = []
    for i, u in enumerate(uids):
        if u is None:
            hostile.append(None)
        elif i % 5 == 0:
            hostile.append(-u - 1)                  # negative band
        elif i % 5 == 1:
            hostile.append(u - (1 << 62))           # huge negative
        elif i % 5 == 2:
            hostile.append(u + (1 << 61))           # huge positive
        elif i % 5 == 3:
            hostile.append(u - 2147483647)          # straddles -P..0
        else:
            hostile.append(u)
    cols = {
        f.name: (
            pa.array(hostile, f.type) if f.name == "user_id" else t[f.name]
        )
        for f in t.schema
    }
    pq.write_table(pa.table(cols, schema=t.schema), f"{dst}/events.parquet")
    return dst


def test_sketch_keys_match_oracles_on_negative_ids(spark, negative_ids_dir):
    qs = catalog.queries()
    oracles = catalog.oracle_sql()
    con = duckdb_connect(negative_ids_dir)
    failures = []
    for key in KEYS:
        assert key in oracles, f"{key} lost its oracle"
        try:
            probs = compare_frames(
                qs[key](spark, negative_ids_dir).toPandas(),
                con.execute(oracles[key]).fetchdf(),
            )
        except Exception as exc:  # noqa: BLE001
            probs = [f"{type(exc).__name__}: {exc}"]
        if probs:
            failures.append((key, str(probs[0])[:160]))
    con.close()
    assert not failures, failures
