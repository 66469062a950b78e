"""Join operators Spark lacks natively, composed from relational primitives.

SURVEY.md §2.3 / §4: Spark has no ASOF JOIN strategy; the engine provides it
as a composition (equi-join + range filter + argmax) that Catalyst plans with
ordinary hash/sort-merge machinery, and an ``applyInPandas(merge_asof)``
variant for wide-lookback cases where materializing every (probe, candidate)
pair would blow up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_time: str,
    build_time: str,
    direction: str = "backward",
    payload_cols: tuple[str, ...] = (),
) -> DataFrame:
    """For each probe row, attach the nearest build-side time at-or-before
    (``backward``) / at-or-after (``forward``) the probe time, per ``on`` key.

    Inner semantics (probe rows with no candidate are dropped), matching
    DuckDB/pandas ASOF defaults.

    Plan shape: equi-join on the key (shuffle or broadcast — Catalyst
    decides), range filter, then argmax per probe row. The argmax re-groups
    on the probe's full row identity, so ``probe`` columns must be unique per
    row (callers pass a key-complete projection).

    100 TB posture: the intermediate is |probe ⋈_key build| rows — fine when
    per-key candidate lists are bounded (events per user per horizon). For
    unbounded lookback use :func:`asof_join_pandas`, which sorts
    per-partition instead of materializing pairs.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    probe_cols = probe.columns
    b = build.withColumnRenamed(on, "__asof_key")
    cond = probe[on] == b["__asof_key"]
    if direction == "backward":
        rng = b[build_time] <= probe[probe_time]
        pick = F.max(build_time)
    else:
        rng = b[build_time] >= probe[probe_time]
        pick = F.min(build_time)
    joined = probe.join(b, cond & rng, "inner")
    matched = joined.groupBy(*[probe[c] for c in probe_cols]).agg(
        pick.alias(build_time)
    )
    if not payload_cols:
        return matched
    # Attach build-side payloads by joining back on (key, matched time).
    # Ties (same key+time, different payload) are resolved deterministically
    # before the join-back so the as-of result stays one row per probe row.
    from .dedup import dedup_exact

    payload = dedup_exact(
        build.select(on, build_time, *payload_cols),
        keys=[on, build_time],
        order_by=list(payload_cols),
    )
    return matched.join(payload, [on, build_time], "inner")


def asof_join_pandas(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_time: str,
    build_time: str,
) -> DataFrame:
    """Backward as-of join via per-key ``pandas.merge_asof``.

    Scale path for unbounded lookback: co-groups both sides by key (one
    shuffle each), then a sorted merge per group — no pairwise blowup.
    """
    import pandas as pd

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in probe.schema.fields
    ) + f", {build_time} timestamp"

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=[*left.columns, build_time])
        left = left.sort_values(probe_time)
        right = right.sort_values(build_time)
        merged = pd.merge_asof(
            left, right[[build_time]], left_on=probe_time, right_on=build_time,
            direction="backward",
        )
        return merged.dropna(subset=[build_time])

    return (
        probe.groupBy(on)
        .cogroup(build.groupBy(on))
        .applyInPandas(lambda l, r: merge(l, r), schema=out_schema)
    )


def range_join_bucketed(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Keyless range join (ts ∈ [start, end)) without a nested loop.

    Spark plans a pure non-equi join as BroadcastNestedLoopJoin — O(n·m)
    and a driver OOM once neither side broadcasts. The scale decomposition
    manufactures an equi key: explode every interval into the hour buckets
    it overlaps (intervals are short — a handful of buckets each), bucket
    each event by its hour, hash-join on the bucket, then apply the exact
    range predicate as a residual filter. Work becomes O(events +
    interval-bucket pairs), shuffled on a uniform time key; the same
    decomposition at any granularity (minute/day) trades fan-out for
    bucket selectivity. Spark's own storage-partitioned range-join
    optimizations don't exist in open Spark 4 — this composition is the
    portable form."""
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col(start_col)),
                F.date_trunc("hour", F.col(end_col)),
                F.expr("INTERVAL 1 HOUR"),
            )
        ),
    )
    ev = events.withColumn("_bkt", F.date_trunc("hour", F.col(ts_col)))
    return (
        ev.join(iv, "_bkt")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop("_bkt")
    )


def fuzzy_join_blocked(
    df: DataFrame,
    name_col: str,
    max_dist: int = 3,
    n_block_tokens: int = 2,
) -> DataFrame:
    """Blocked fuzzy self-join: name pairs within ``max_dist`` edit distance.

    Entity-resolution pattern (the reconstructed reference's Asana ETL dedups
    user/project names on sync; SURVEY.md §0 — no file citations possible,
    empty snapshot). A naive fuzzy join is a cross join — O(n²) comparisons,
    a BroadcastNestedLoopJoin that cannot survive 100 TB. Standard blocking
    makes it tractable: candidate pairs must agree on at least one blocking
    key (here: token #i of the name, i < ``n_block_tokens``), so each block
    is a plain equi shuffle join; the union of blocks is deduplicated and
    only candidates pay the Levenshtein comparison.

    Semantics are therefore *blocked* fuzzy match — pairs sharing no block
    token are not compared (at ``max_dist`` small relative to token length
    such pairs cannot match anyway). Output: ``name_a < name_b, dist``.
    """
    names = df.select(F.col(name_col).alias("name")).distinct()
    toks = names.withColumn("toks", F.split("name", r"\s+"))
    blocked: DataFrame | None = None
    for i in range(n_block_tokens):
        b = toks.select("name", F.col("toks").getItem(i).alias("blk")).filter(
            F.col("blk").isNotNull()
        )
        pairs = (
            b.alias("a")
            .join(b.alias("b"), on="blk")
            .filter(F.col("a.name") < F.col("b.name"))
            .select(
                F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b")
            )
        )
        blocked = pairs if blocked is None else blocked.unionByName(pairs)
    assert blocked is not None
    return (
        blocked.distinct()
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
    )
