"""Numeric-soundness probe for the Lloyd-fixpoint SQL oracles (round 5).

Usage:  python scripts/margin_probe.py [sf_dir ...]

The q_emb_kmeans / q_dedup_semantic oracles replay k-means in DuckDB, which
is only sound if no point's cluster assignment can flip under cross-engine
float drift (~1e-15 relative: different summation orders in centroid means
and distance folds). This probe replays the EXACT Lloyd trajectory
(first-k-ids init, argmin with (dist2, cluster) tie-break, empty-cluster
carry-over) in numpy for both registered configs and reports:

- the minimum relative margin between each point's best and second-best
  centroid distance, over ALL iterations (an assignment can only flip if
  drift exceeds this), and
- for the semantic config, the minimum |cos - threshold| over within-cluster
  pairs at the final assignment (the pair-count can only change if drift
  exceeds this).

Round-5 measurements: assignment margins ≥ 5.6e-7 and cosine margins
≥ 5.1e-6 at both gate scales — 8-9 orders of magnitude above drift. If a
future testdata regeneration shrinks these below ~1e-9, demote the two keys
back to rows-only before the gate sees them.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np

CONFIGS = [
    ("q_emb_kmeans", 8, 5, None),
    ("q_dedup_semantic", 16, 2, 0.28),
]


def probe(sf_dir: str) -> bool:
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "WHERE embedding IS NOT NULL ORDER BY vec_id"
    ).fetchall()
    X = np.array([r[1] for r in rows], dtype=np.float64)
    ok = True
    for key, k, n_iter, thr in CONFIGS:
        cents = X[:k].copy()
        min_margin = np.inf
        best = None
        for it in range(n_iter + 1):  # n_iter updates + the final assign
            d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            part = np.sort(d2, axis=1)
            margins = (part[:, 1] - part[:, 0]) / np.maximum(part[:, 1], 1e-300)
            min_margin = min(min_margin, float(margins.min()))
            best = d2.argmin(axis=1)
            if it < n_iter:
                for c in range(k):
                    m = best == c
                    if m.any():
                        cents[c] = X[m].mean(axis=0)
        line = f"{key:18s} {sf_dir}: min assign margin {min_margin:.3e}"
        if thr is not None:
            norms = np.linalg.norm(X, axis=1)
            min_thr = np.inf
            for c in range(k):
                idx = np.where(best == c)[0]
                if len(idx) < 2:
                    continue
                sub, n = X[idx], norms[idx]
                cos = (sub @ sub.T) / np.outer(n, n)
                iu = np.triu_indices(len(idx), 1)
                min_thr = min(min_thr, float(np.abs(cos[iu] - thr).min()))
            line += f", min |cos-{thr}| {min_thr:.3e}"
            ok &= min_thr > 1e-9
        ok &= min_margin > 1e-9
        print(line)
    return ok


def main() -> int:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    ok = all([probe(d) for d in dirs])
    print("margins", "SAFE (>1e-9)" if ok else "TOO SMALL — demote to rows-only")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
