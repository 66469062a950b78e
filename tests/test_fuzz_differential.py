"""Randomized differential testing: one seeded query AST, two engines.

The 227 catalog keys pin fixed query shapes; this module generates NEW
shapes — random conjunctive predicates, group-key subsets, aggregate
bundles, and an optional orders join over lineitem — renders each AST twice
(a Spark DataFrame plan and DuckDB SQL), and strict-compares the results
with ``testing.compare_frames`` (dtype-strict, the driver-hash contract).

This is the parity discipline's adversary: every generated query runs the
engine-portable aggregation helpers (``functions.parity``) in compositions
nobody hand-wrote, so a latent drift class (like the r02 DuckDB-HUGEINT →
float64 windowed SUM) gets a combinatorial chance to surface locally before
any external gate sees it. The integer-SUM aggregate below deliberately
includes that exact class — its oracle rendering must CAST to BIGINT, and
removing the cast makes several seeds fail.

Seeds are fixed (no flakiness); each seed is an independent pytest case so
a failure names its shape. ~25 shapes × (one Spark job + one DuckDB query)
at sf0.001 keeps the module in tens of seconds.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

import pytest
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_asana_spark.functions import parity
from etl_asana_spark.registry import load_tables
from etl_asana_spark.testing import compare_frames


@dataclass(frozen=True)
class Pred:
    col: Column
    sql: str


@dataclass(frozen=True)
class Key:
    name: str
    col: Column
    sql: str  # SELECT-list expression (aliased by name); also the GROUP BY expr


@dataclass(frozen=True)
class Agg:
    name: str
    col: Column
    sql: str


def _preds(rng: random.Random, joined: bool) -> list[Pred]:
    """0–3 random conjuncts. Constants are drawn from literals both parsers
    map to the identical double/date, so predicate truth is engine-equal."""
    pool: list[Pred] = []
    q = rng.randint(2, 49)
    op = rng.choice(["<", "<=", ">", ">="])
    pool.append(
        Pred(F.expr(f"l_quantity {op} {q}"), f"l_quantity {op} {q}")
    )
    lo = rng.randint(0, 6) / 100.0
    hi = lo + rng.randint(1, 4) / 100.0
    pool.append(
        Pred(
            F.col("l_discount").between(lo, hi),
            f"l_discount BETWEEN {lo} AND {hi}",
        )
    )
    d = f"199{rng.randint(2, 8)}-0{rng.randint(1, 9)}-15 00:00:00"
    if rng.random() < 0.5:
        pool.append(
            Pred(
                F.col("l_shipdate") >= F.lit(d).cast("timestamp"),
                f"l_shipdate >= TIMESTAMP '{d}'",
            )
        )
    else:
        pool.append(
            Pred(
                F.col("l_shipdate") < F.lit(d).cast("timestamp"),
                f"l_shipdate < TIMESTAMP '{d}'",
            )
        )
    flags = rng.sample(["A", "N", "R"], rng.randint(1, 2))
    in_list = ", ".join(f"'{x}'" for x in flags)
    pool.append(
        Pred(F.col("l_returnflag").isin(flags), f"l_returnflag IN ({in_list})")
    )
    lns = rng.sample([1, 2, 3, 4, 5, 6, 7], rng.randint(1, 3))
    in_lns = ", ".join(str(n) for n in lns)
    pool.append(
        Pred(F.col("l_linenumber").isin(lns), f"l_linenumber IN ({in_lns})")
    )
    if joined:
        pri = rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED"])
        pool.append(
            Pred(
                F.col("o_orderpriority") <= F.lit(pri),
                f"o_orderpriority <= '{pri}'",
            )
        )
    return rng.sample(pool, rng.randint(0, 3))


def _keys(rng: random.Random, joined: bool) -> list[Key]:
    pool = [
        Key("rf", F.col("l_returnflag"), "l_returnflag"),
        Key("ls", F.col("l_linestatus"), "l_linestatus"),
        Key("ln", F.col("l_linenumber"), "l_linenumber"),
        # int32 (Spark) vs int64 (DuckDB) — width must not matter to the
        # strict compare, only the int-vs-float KIND does.
        Key("yr", F.year("l_shipdate"), "year(l_shipdate)"),
    ]
    if joined:
        pool.append(Key("pri", F.col("o_orderpriority"), "o_orderpriority"))
    return rng.sample(pool, rng.randint(0, 2))


def _aggs(rng: random.Random) -> list[Agg]:
    pool = [
        Agg("n", F.count(F.lit(1)), "COUNT(*)"),
        # The r02 drift class on purpose: DuckDB SUM(int) is HUGEINT, which
        # pandas materializes as float64 — the oracle side MUST cast.
        Agg(
            "sum_supp",
            F.sum("l_suppkey"),
            "CAST(SUM(l_suppkey) AS BIGINT)",
        ),
        Agg("sum_qty", parity.dsum("l_quantity"), parity.sql_dsum("l_quantity")),
        Agg(
            "rev",
            parity.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            parity.sql_dsum("l_extendedprice * (1 - l_discount)"),
        ),
        Agg(
            "avg_price",
            parity.davg("l_extendedprice"),
            parity.sql_davg("l_extendedprice"),
        ),
        Agg("min_disc", F.min("l_discount"), "MIN(l_discount)"),
        Agg("max_tax", F.max("l_tax"), "MAX(l_tax)"),
        Agg("last_ship", F.max("l_shipdate"), "MAX(l_shipdate)"),
        Agg(
            "n_parts",
            F.countDistinct("l_partkey"),
            "COUNT(DISTINCT l_partkey)",
        ),
    ]
    return rng.sample(pool, rng.randint(1, 4))


@dataclass(frozen=True)
class Shape:
    joined: bool
    preds: list[Pred]
    keys: list[Key]
    aggs: list[Agg]


def gen_shape(seed: int) -> Shape:
    rng = random.Random(seed)
    joined = rng.random() < 0.4
    return Shape(
        joined=joined,
        preds=_preds(rng, joined),
        keys=_keys(rng, joined),
        aggs=_aggs(rng),
    )


def run_spark(spark: SparkSession, sf_dir: str, s: Shape) -> DataFrame:
    t = load_tables(spark, sf_dir)
    df = t["lineitem"]
    if s.joined:
        df = df.join(
            t["orders"], df["l_orderkey"] == t["orders"]["o_orderkey"]
        )
    for p in s.preds:
        df = df.filter(p.col)
    aggs = [a.col.alias(a.name) for a in s.aggs]
    if s.keys:
        return df.groupBy(*[k.col.alias(k.name) for k in s.keys]).agg(*aggs)
    return df.agg(*aggs)


def to_sql(s: Shape) -> str:
    src = "lineitem"
    if s.joined:
        src = "lineitem JOIN orders ON l_orderkey = o_orderkey"
    where = (
        " WHERE " + " AND ".join(f"({p.sql})" for p in s.preds)
        if s.preds
        else ""
    )
    select = ", ".join(
        [f"{k.sql} AS {k.name}" for k in s.keys]
        + [f"{a.sql} AS {a.name}" for a in s.aggs]
    )
    group = (
        " GROUP BY " + ", ".join(k.sql for k in s.keys) if s.keys else ""
    )
    return f"SELECT {select} FROM {src}{where}{group}"


SEEDS = list(range(25))


@pytest.mark.parametrize("seed", SEEDS)
def test_random_shape_parity(spark, duck, sf_dir, seed):
    s = gen_shape(seed)
    got = run_spark(spark, sf_dir, s).toPandas()
    want = duck.execute(to_sql(s)).fetchdf()
    problems = compare_frames(got, want)
    assert not problems, f"seed={seed} sql={to_sql(s)} problems={problems[:3]}"


def test_seed_space_is_diverse():
    """The generator must actually exercise joins, global aggs, and grouped
    aggs across the pinned seed list — guard against a refactor collapsing
    the space."""
    shapes = [gen_shape(s) for s in SEEDS]
    assert any(s.joined for s in shapes)
    assert any(not s.keys for s in shapes)
    assert any(len(s.keys) == 2 for s in shapes)
    assert any(not s.preds for s in shapes)
    assert any(len(s.preds) == 3 for s in shapes)
