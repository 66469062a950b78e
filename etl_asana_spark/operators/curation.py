"""Corpus curation operators: deterministic slicing for training pipelines.

The catalog's curation queries (q_sample_hash / q_cap_per_source /
q_mix_corpus) compose these ideas inline; this module exposes the reusable
primitive: content-addressed bucketing. Membership in any slice is a pure
function of the row's id — reproducible across runs, engines, partition
layouts, and re-extractions, which is the property that makes a training
split auditable. ``rand()``-based sampling has none of these.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Knuth multiplicative hash modulus/multiplier — portable arithmetic that
#: any engine (and any auditor with a calculator) can reproduce exactly.
_MULT = 2654435761
_MOD = 4294967296


def hash_bucket(id_col: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from an integer id column."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return ((c * F.lit(_MULT)) % F.lit(_MOD)) % F.lit(n_buckets)


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
) -> dict[str, DataFrame]:
    """Split into named slices by contiguous hash-bucket ranges.

    ``fractions`` maps slice name → fraction; fractions must sum to ≤ 1
    (any remainder is simply unassigned). Slices are disjoint and stable:
    a row's slice never changes when data is added, re-partitioned, or the
    job re-runs — the contract a train/val/test split must keep.
    """
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    bucket = hash_bucket(id_col, 10_000)
    out: dict[str, DataFrame] = {}
    lo = 0
    for name, frac in fractions.items():
        hi = lo + int(round(frac * 10_000))
        out[name] = df.filter((bucket >= lo) & (bucket < hi))
        lo = hi
    return out
