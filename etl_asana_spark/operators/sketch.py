"""Count-min sketch as a DataFrame — re-aggregatable heavy-hitter counts.

The CMS is just a (depth × width) counter table, and counter tables are what
DataFrames do best: build = explode each row into ``depth`` (row, bucket)
pairs and count; merge = union + groupBy-sum (counts are sums, so daily
sketches roll up to weekly exactly like the HLL sketches in
q_agg_hll_rollup); estimate = min over the key's ``depth`` counters.

Size: ≤ depth·width rows regardless of input cardinality (4×8192 here —
a few hundred KB), so the sketch broadcasts. Guarantees: estimates NEVER
undercount (hash collisions only add), and overcount ≤ εN with
ε ≈ e/width at failure probability e^-depth — both asserted in tests.

Hashes: the default is ``xxhash64(value, i)`` — deterministic across
runs/partitions so builds are reproducible, but JVM-only.
``portable=True`` (r06) swaps in the LCG row family
``((a_i·(x mod P) + b_i) mod P) mod width`` over INTEGER keys — exact in
BIGINT and replayable in DuckDB, which is what gives q_agg_cms_topk a full
SQL oracle. Same guarantees either way (pairwise-independence-style
hashing is all CMS needs; the ε/δ bounds are asserted for both in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Portable integer-hash rows (shared LCG constants; P = 2^31-1 keeps
#: every product < 2^62). Single-sourced into the q_agg_cms_topk oracle.
CMS_P = 2147483647
CMS_COEFFS = (
    (1103515245, 12345),
    (1140671485, 12820163),
    (214013, 2531011),
    (16843009, 826366247),
)


def _bucket(col: Column, i: int, width: int, portable: bool) -> Column:
    if not portable:
        return F.pmod(F.xxhash64(col, F.lit(i)), F.lit(width))
    a, b = CMS_COEFFS[i]
    x = F.pmod(col.cast("long"), F.lit(CMS_P).cast("long"))
    return F.pmod(
        (F.lit(a).cast("long") * x + F.lit(b).cast("long"))
        % F.lit(CMS_P).cast("long"),
        F.lit(width).cast("long"),
    )


def _pairs(col: Column, depth: int, width: int, portable: bool = False) -> Column:
    if portable and depth > len(CMS_COEFFS):
        raise ValueError(f"portable CMS supports depth <= {len(CMS_COEFFS)}")
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    _bucket(col, i, width, portable).alias("bucket"),
                )
                for i in range(depth)
            ]
        )
    )


def cms_build(
    df: DataFrame, col: str, *, depth: int = 4, width: int = 8192,
    portable: bool = False,
) -> DataFrame:
    """Sketch table (i, bucket, cnt) for the values of ``col``.
    ``portable=True`` hashes with the integer LCG family (NULL keys are
    outside the sketch domain there — a NULL bucket counts nothing and
    matches nothing, mirrored by the SQL oracle's IS NOT NULL)."""
    base = df.filter(F.col(col).isNotNull()) if portable else df
    return (
        base.select(_pairs(F.col(col), depth, width, portable).alias("p"))
        .groupBy(F.col("p.i").alias("i"), F.col("p.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union partial sketches (same depth/width) into one — counter sums."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("i", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    col: str,
    *,
    depth: int = 4,
    width: int = 8192,
    portable: bool = False,
) -> DataFrame:
    """Point estimates for ``keys[col]``: min over the depth counters.
    The sketch side is tiny — broadcast it, never shuffle the keys."""
    probes = keys.select(
        F.col(col), _pairs(F.col(col), depth, width, portable).alias("p")
    ).select(col, F.col("p.i").alias("i"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["i", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )
