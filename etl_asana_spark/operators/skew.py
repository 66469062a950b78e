"""Skew-mitigation operators (SURVEY §4 "AQE + manual salting", §7 rule 6).

AQE's skew-join splitting handles most runtime skew; these are the manual
tools for *pathological known-hot keys* — the case AQE can't fix because a
single key's hash partition exceeds executor memory no matter how it's
split-joined (e.g. one user producing 1% of a 100 TB event stream).

Both operators are pure DataFrame compositions: deterministic salts from
``xxhash64`` (never ``rand()`` — a retried task must re-derive the same
salt or shuffle retries corrupt results), dim replication via
``explode(sequence(...))``, and two-phase aggregation. Equivalence with the
unsalted plans is property-tested in tests/test_skew.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def _deterministic_salt(cols: Sequence[str], n_salts: int) -> Column:
    """Per-row salt in [0, n_salts): stable across retries/replays because it
    hashes row content instead of drawing randomness."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    *,
    n_salts: int = 8,
    salt_src: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``fact``'s ``on`` keys are pathologically skewed and
    ``dim`` is too large to broadcast outright.

    fact rows get a content-derived salt; dim rows are replicated once per
    salt value (×``n_salts`` — bounded, explicit cost); the join runs on
    ``on + [salt]``, spreading each hot key over ``n_salts`` shuffle
    partitions. Result is row-identical to ``fact.join(dim, on, how)``.

    ``salt_src``: fact columns whose hash spreads the hot key's rows (a
    unique id, or event payload columns) — must NOT be the join key alone,
    which would put every hot-key row back in one bucket.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        # right/full would surface each unmatched dim row n_salts times
        # (the dim side is replicated); those joins need a different shape.
        raise ValueError(f"salted_join supports fact-preserving joins only, got {how!r}")
    salted_fact = fact.withColumn(_SALT, _deterministic_salt(salt_src, n_salts))
    salted_dim = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_fact.join(salted_dim, [*on, _SALT], how).drop(_SALT)


def salted_sum_by_key(
    df: DataFrame,
    keys: Sequence[str],
    sums: dict[str, Column],
    *,
    n_salts: int = 8,
    salt_src: Sequence[str],
) -> DataFrame:
    """Two-phase aggregation for a hot grouping key: partial agg on
    ``keys + salt`` (spreads the hot key across reducers), then final agg on
    ``keys``. Only decomposable aggregates (sum/count/min/max) belong here —
    pass the *partial* expression; the final phase re-sums.

    Spark's map-side partial aggregation already bounds most skew; this adds
    a second *reduce-side* spreading for the one-key-per-partition-overflow
    case.
    """
    partial = df.withColumn(_SALT, _deterministic_salt(salt_src, n_salts)).groupBy(
        *keys, _SALT
    )
    partial_df = partial.agg(*[expr.alias(name) for name, expr in sums.items()])
    return (
        partial_df.groupBy(*keys)
        .agg(*[F.sum(name).alias(name) for name in sums])
    )
