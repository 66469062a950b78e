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

Hashes are ``xxhash64(value, i)`` — deterministic across runs/partitions,
so sketch builds are reproducible (no engine-portable oracle, though:
DuckDB has no xxhash64 → the catalog entry is rows-only)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, i: int, width: int) -> Column:
    return F.pmod(F.xxhash64(col, F.lit(i)), F.lit(width))


def _pairs(col: Column, depth: int, width: int) -> Column:
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"), _bucket(col, i, width).alias("bucket")
                )
                for i in range(depth)
            ]
        )
    )


def cms_build(
    df: DataFrame, col: str, *, depth: int = 4, width: int = 8192
) -> DataFrame:
    """Sketch table (i, bucket, cnt) for the values of ``col``."""
    return (
        df.select(_pairs(F.col(col), depth, width).alias("p"))
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
) -> DataFrame:
    """Point estimates for ``keys[col]``: min over the depth counters.
    The sketch side is tiny — broadcast it, never shuffle the keys."""
    probes = keys.select(
        F.col(col), _pairs(F.col(col), depth, width).alias("p")
    ).select(col, F.col("p.i").alias("i"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["i", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )
