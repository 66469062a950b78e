"""Fuzz tier 21: embedding-oracle parity on a HOSTILE embeddings fixture.

The three embedding keys with iterative SQL oracles (q_emb_kmeans,
q_dedup_semantic via the Lloyd CTE; q_emb_pca via the power-iteration CTE,
new in round 6) have only ever been oracle-checked against the shipped
corpora: uniform float32 in [-0.45, 0.49], d=64. This tier rebuilds
embeddings with the shapes a real corpus throws at the operators —

- d=32, NOT the fixture's 64 (end-to-end regression for the r05 advice:
  both CTE families must derive dimensionality from the data, never a
  hardcoded generate_series(1, 64));
- magnitudes spanning 1e-3..1e3 (mixed-scale sources);
- a heavy negative quadrant, an all-zero vector, near-duplicate pairs
  (1e-3 perturbations), and NULL embeddings interleaved;

then asserts every key still hash-matches its oracle. The corpus is
seed-fixed and was margin-probed once at authoring time (same logic as
scripts/margin_probe.py: assignment margins and fixed-point margins orders
of magnitude above summation-order drift), so parity here is deterministic,
not flaky; the in-test margin guard re-checks that precondition and fails
loudly — rather than skipping — if a library change ever erodes it.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_asana_spark import catalog
from etl_asana_spark.testing import compare_frames, duckdb_connect

KEYS = (
    "q_emb_kmeans",
    "q_dedup_semantic",
    "q_emb_pca",
    "q_sim_ann",   # r06 portable sign-projection LSH
    "q_sim_ivf",   # r06 deterministic-Lloyd IVF
)
D = 32


def _hostile_vectors(n: int = 300, d: int = D) -> list[list[float] | None]:
    rng = np.random.default_rng(2106)
    out: list[list[float] | None] = []
    for i in range(n):
        kind = i % 6
        if kind == 0:
            v = rng.normal(size=d)
        elif kind == 1:
            v = rng.normal(size=d) * 1e3
        elif kind == 2:
            v = rng.normal(size=d) * 1e-3
        elif kind == 3:
            v = -np.abs(rng.normal(size=d))
        elif kind == 4 and out and out[-1] is not None:
            # near-dup: close enough to land in one semantic-dedup cluster,
            # far enough (1e-3, probed) that no Lloyd assignment decision
            # between them sits within drift reach
            v = np.array(out[-1]) + rng.normal(size=d) * 1e-3
        else:
            v = rng.uniform(-0.5, 0.5, size=d)
        out.append([float(x) for x in np.asarray(v, dtype=np.float32)])
    out[7] = [0.0] * d          # exact zero vector
    out[13] = None              # NULLs interleaved
    out[201] = None
    return out


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("hostile_emb_sf"))
    for name in os.listdir(src):
        if name != "embeddings.parquet":
            shutil.copy(f"{src}/{name}", f"{dst}/{name}")
    vecs = _hostile_vectors()
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 4 for i in range(len(vecs))], pa.int32()),
        }
    )
    pq.write_table(table, f"{dst}/embeddings.parquet")
    return dst


def test_hostile_corpus_margins_are_safe(hostile_dir):
    # Precondition guard (not a skip): the parity assertions below are only
    # meaningful while no assignment/rounding decision sits within reach of
    # summation-order drift. Mirrors scripts/margin_probe.py.
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{hostile_dir}/embeddings.parquet' "
        "WHERE embedding IS NOT NULL ORDER BY vec_id"
    ).fetchall()
    x = np.array([r[1] for r in rows], dtype=np.float64)
    for k, n_iter in ((8, 5), (16, 2)):  # the two Lloyd configs
        cents = x[:k].copy()
        min_margin = np.inf
        for it in range(n_iter + 1):
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            part = np.sort(d2, axis=1)
            margins = (part[:, 1] - part[:, 0]) / np.maximum(part[:, 1], 1e-300)
            min_margin = min(min_margin, float(margins.min()))
            if it < n_iter:
                best = d2.argmin(axis=1)
                for c in range(k):
                    m = best == c
                    if m.any():
                        cents[c] = x[m].mean(axis=0)
        assert min_margin > 1e-9, (k, n_iter, min_margin)


@pytest.mark.slow  # ~13 s hostile-corpus sweep; opt-in (r11, see pytest.ini)
def test_embedding_keys_match_oracles_on_hostile_corpus(spark, hostile_dir):
    qs = catalog.queries()
    oracles = catalog.oracle_sql()
    con = duckdb_connect(hostile_dir)
    failures = []
    for key in KEYS:
        assert key in oracles, f"{key} lost its oracle"
        try:
            probs = compare_frames(
                qs[key](spark, hostile_dir).toPandas(),
                con.execute(oracles[key]).fetchdf(),
            )
        except Exception as exc:  # noqa: BLE001
            probs = [f"{type(exc).__name__}: {exc}"]
        if probs:
            failures.append((key, str(probs[0])[:160]))
    con.close()
    assert not failures, failures
