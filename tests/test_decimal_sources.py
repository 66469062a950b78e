"""DecimalType SOURCE-data coverage — the last r03-verdict "missing" item.

Until now decimal entered the engine only via casts and the fixed-point
parity layer; no testdata table carries a DecimalType column, so nothing
proved the operator surface works when the PARQUET ITSELF is decimal
(physical FIXED_LEN_BYTE_ARRAY / INT64 decimal columns, the layout every
finance-shaped 100 TB lake actually uses). This module closes that gap:

- a Spark-written decimal parquet (DECIMAL(12,2) money, DECIMAL(38,10)
  rate, nulls, negatives, precision-boundary magnitudes) is the shared
  fixture;
- every family that matters over money columns — scan, filter+pushdown,
  groupBy agg, window running sum, join-on-decimal-key, global sort,
  dsum-after-cast — is run on BOTH engines and compared exactly.

Comparison discipline: decimal aggregates are cast to STRING on both
sides. Spark's toPandas yields ``decimal.Decimal`` cells while DuckDB's
fetchdf converts DECIMAL to float64 — numerically close, kind-different,
exactly the int-vs-float drift class the external gate hashes red. A
string boundary ("1.50", "-0.05", scale-pinned) is exact, portable, and
verified identical across both engines (probe: Spark CAST(x AS STRING) ≡
DuckDB CAST(x AS VARCHAR) for every fixture row, trailing zeros kept).
"""

from __future__ import annotations

import decimal
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_asana_spark.functions import parity
from etl_asana_spark.plans import summarize
from etl_asana_spark.testing import compare_frames

N_ROWS = 4000
N_GROUPS = 23


def _gen_rows(seed: int = 94):
    """Deterministic rows with the shapes that break decimal pipelines:
    negatives, nulls, exact ties, sub-cent scale-10 rates, and values at
    the DECIMAL(12,2) precision boundary."""
    rng = random.Random(seed)
    D = decimal.Decimal
    rows = []
    for i in range(N_ROWS):
        grp = f"g{rng.randrange(N_GROUPS):02d}"
        kind = rng.random()
        if kind < 0.05:
            amount = None
        elif kind < 0.10:
            amount = D("9999999999.99") if rng.random() < 0.5 else D("-9999999999.99")
        elif kind < 0.30:
            amount = D(rng.randrange(-10_000, 10_000)) / 100  # tie-heavy cents
        else:
            amount = D(rng.randrange(-10**9, 10**9)) / 100
        rate = (
            None
            if rng.random() < 0.07
            else D(rng.randrange(-10**10, 10**10)) / D(10**10)
        )
        rows.append((i, grp, amount, rate))
    return rows


@pytest.fixture(scope="module")
def dec_dir(spark, tmp_path_factory) -> str:
    path = str(tmp_path_factory.mktemp("decimal_src") / "ledger.parquet")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("grp", T.StringType(), False),
            T.StructField("amount", T.DecimalType(12, 2), True),
            T.StructField("rate", T.DecimalType(38, 10), True),
        ]
    )
    spark.createDataFrame(_gen_rows(), schema).repartition(8).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def _duck_rel(duck, dec_dir: str) -> str:
    return f"read_parquet('{dec_dir}/*.parquet')"


def test_schema_roundtrip_and_raw_parity(spark, duck, dec_dir):
    """Spark-written decimal parquet reads back with exact precision/scale
    on BOTH engines, and every cell matches at a string boundary."""
    df = spark.read.parquet(dec_dir)
    assert dict((f.name, f.dataType.simpleString()) for f in df.schema.fields) == {
        "id": "bigint",
        "grp": "string",
        "amount": "decimal(12,2)",
        "rate": "decimal(38,10)",
    }
    assert [t[0] for t in duck.execute(
        f"SELECT typeof(amount), typeof(rate) FROM {_duck_rel(duck, dec_dir)} LIMIT 1"
    ).fetchall()[0:1]] == ["DECIMAL(12,2)"]
    got = df.select(
        "id", F.col("amount").cast("string").alias("a"),
        F.col("rate").cast("string").alias("r"),
    ).toPandas()
    exp = duck.execute(
        f"SELECT id, CAST(amount AS VARCHAR) a, CAST(rate AS VARCHAR) r "
        f"FROM {_duck_rel(duck, dec_dir)}"
    ).fetchdf()
    assert compare_frames(got, exp) == []


def test_groupby_agg_parity(spark, duck, dec_dir):
    """sum/avg/min/max/count over a decimal money column, per group —
    decimal SUM in both engines is exact integer arithmetic, so equality
    is strict (no float tolerance anywhere)."""
    df = spark.read.parquet(dec_dir)
    got = (
        df.groupBy("grp")
        .agg(
            F.sum("amount").cast("decimal(38,2)").cast("string").alias("sum_amt"),
            F.avg("amount").cast("decimal(38,6)").cast("string").alias("avg_amt"),
            F.min("amount").cast("string").alias("min_amt"),
            F.max("amount").cast("string").alias("max_amt"),
            F.count("amount").alias("n_amt"),
        )
        .toPandas()
    )
    exp = duck.execute(
        f"""
        SELECT grp,
               CAST(CAST(sum(amount) AS DECIMAL(38,2)) AS VARCHAR) AS sum_amt,
               CAST(CAST(avg(amount) AS DECIMAL(38,6)) AS VARCHAR) AS avg_amt,
               CAST(min(amount) AS VARCHAR) AS min_amt,
               CAST(max(amount) AS VARCHAR) AS max_amt,
               count(amount) AS n_amt
        FROM {_duck_rel(duck, dec_dir)} GROUP BY grp
        """
    ).fetchdf()
    assert compare_frames(got, exp) == []


def test_window_running_sum_parity(spark, duck, dec_dir):
    """Running decimal sum per group in id order — windowed decimal
    arithmetic stays exact through the frame accumulator."""
    from pyspark.sql.window import Window

    df = spark.read.parquet(dec_dir).where(F.col("id") < 600)
    w = Window.partitionBy("grp").orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    got = df.select(
        "id", "grp",
        F.sum("amount").over(w).cast("decimal(38,2)").cast("string").alias("run_amt"),
    ).toPandas()
    exp = duck.execute(
        f"""
        SELECT id, grp,
               CAST(CAST(sum(amount) OVER (PARTITION BY grp ORDER BY id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DECIMAL(38,2)) AS VARCHAR) AS run_amt
        FROM {_duck_rel(duck, dec_dir)} WHERE id < 600
        """
    ).fetchdf()
    assert compare_frames(got, exp) == []


def test_join_on_decimal_key_parity(spark, duck, dec_dir):
    """Equi-join ON the decimal column itself (tie-heavy cents rows make
    real multi-row matches) — hash/compare of decimal keys must agree."""
    df = spark.read.parquet(dec_dir)
    small = df.where((F.col("id") < 200) & F.col("amount").isNotNull()).select(
        F.col("amount").alias("probe_amt")
    ).distinct()
    got = (
        df.join(F.broadcast(small), df["amount"] == small["probe_amt"])
        .groupBy(F.col("amount").cast("string").alias("amt"))
        .agg(F.count("*").alias("n"))
        .toPandas()
    )
    exp = duck.execute(
        f"""
        WITH t AS (SELECT * FROM {_duck_rel(duck, dec_dir)}),
        small AS (SELECT DISTINCT amount AS probe_amt FROM t
                  WHERE id < 200 AND amount IS NOT NULL)
        SELECT CAST(t.amount AS VARCHAR) AS amt, count(*) AS n
        FROM t JOIN small ON t.amount = small.probe_amt
        GROUP BY 1
        """
    ).fetchdf()
    assert compare_frames(got, exp) == []


def test_global_sort_with_nulls_parity(spark, duck, dec_dir):
    """Global ORDER BY a decimal incl. negatives + NULLs. Spark ASC
    defaults NULLS FIRST, DuckDB NULLS LAST — the oracle pins NULLS FIRST
    explicitly, the portable way any cross-engine pipeline must."""
    df = spark.read.parquet(dec_dir)
    got = (
        df.orderBy(F.col("amount").asc_nulls_first(), F.col("id"))
        .limit(300)
        .select("id", F.col("amount").cast("string").alias("amt"))
        .toPandas()
    )
    exp = duck.execute(
        f"""
        SELECT id, CAST(amount AS VARCHAR) AS amt
        FROM {_duck_rel(duck, dec_dir)}
        ORDER BY amount ASC NULLS FIRST, id LIMIT 300
        """
    ).fetchdf()
    assert compare_frames(got, exp) == []


def test_decimal_to_dsum_parity(spark, duck, dec_dir):
    """The documented entry path for decimal sources into the parity
    layer: cast to double, then dsum. Both engines canonicalize through
    the same exact fixed-point integers, so equality is bit-exact even
    though the intermediate is floating."""
    df = spark.read.parquet(dec_dir)
    got = (
        df.groupBy("grp")
        .agg(parity.dsum(F.col("amount").cast("double")).alias("dsum_amt"))
        .toPandas()
    )
    exp = duck.execute(
        f"""
        SELECT grp, {parity.sql_dsum('CAST(amount AS DOUBLE)')} AS dsum_amt
        FROM {_duck_rel(duck, dec_dir)} GROUP BY grp
        """
    ).fetchdf()
    assert compare_frames(got, exp) == []


def test_decimal_predicate_pushdown(spark, dec_dir):
    """A filter on the decimal column must reach the parquet reader as a
    pushed filter (decimal min/max stats prune row groups — at 100 TB the
    difference between scanning a day and scanning the lake)."""
    df = (
        spark.read.parquet(dec_dir)
        .where(F.col("amount") > decimal.Decimal("9000000000.00"))
        .select("id", "amount")
    )
    s = summarize(df)
    assert any("amount" in p for p in s.pushed_filters), (
        f"decimal predicate not pushed: {s.pushed_filters}"
    )
    # NB: can't split the schema string on "," — "decimal(12,2)" contains
    # one. Field names are the tokens directly before each ":".
    import re

    cols = set(re.findall(r"(\w+):", s.read_schemas[0]))
    assert cols == {"id", "amount"}


def test_ansi_overflow_is_loud(spark, dec_dir):
    """Casting past DECIMAL(5,2) must raise (ANSI posture: overflow is an
    error, never a silent NULL/wrap) — the engine-wide loudness rule the
    parity layer's bounds documentation relies on."""
    df = spark.read.parquet(dec_dir)
    with pytest.raises(Exception, match="(?i)overflow|cannot be represented|CAST_"):
        df.select(
            F.col("amount").cast(T.DecimalType(5, 2)).alias("tiny")
        ).where(F.col("tiny").isNotNull()).count()


# ---------------------------------------------------------------------------
# r06 verdict item 4: the REGISTERED dsum family on a money-decimal clone of
# the driver testdata (lineitem/orders money columns as genuine
# DECIMAL(15,2) parquet, TPC-H's own money type).
# ---------------------------------------------------------------------------

#: Registered keys whose outputs are all doubles/counts/strings — clean
#: kind-strict comparison even when their INPUT money columns are decimal.
#: Keys that project raw money columns (q_topk, q_sort_global, ...) are
#: exercised by the ledger tests above with the string boundary; DuckDB's
#: fetchdf converts raw DECIMAL cells to float64 while Spark keeps
#: decimal.Decimal, an artifact of the comparison harness, not the engines.
#: q_agg_percentile is excluded by design: DuckDB's median over DECIMAL is
#: non-interpolating (unlike over DOUBLE), a genuine engine semantics
#: difference — the documented migration for percentile work over money is
#: cast-to-double at the scan.
DSUM_FAMILY_KEYS = (
    "q_agg_groupby",
    "q_agg_cond",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_gsets",
    "q_join_star",
    "q_golden_revenue_forecast",
)


@pytest.fixture(scope="module")
def decimal_sf_dir(spark, tmp_path_factory) -> str:
    """A full clone of the test sf_dir whose lineitem/orders money columns
    are physical decimal parquet (the other eight tables are file copies)."""
    import os
    import shutil

    from etl_asana_spark import registry
    from tests.conftest import SF_DIR

    dst = str(tmp_path_factory.mktemp("decimal_sf"))
    for name in registry.TABLE_NAMES:
        if name in ("lineitem", "orders"):
            continue
        shutil.copy(f"{SF_DIR}/{name}.parquet", f"{dst}/{name}.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
        li = li.withColumn(c, F.col(c).cast(T.DecimalType(15, 2)))
    li.coalesce(2).write.mode("overwrite").parquet(f"{dst}/lineitem.parquet")
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumn(
        "o_totalprice", F.col("o_totalprice").cast(T.DecimalType(15, 2))
    )
    od.coalesce(1).write.mode("overwrite").parquet(f"{dst}/orders.parquet")
    return dst


def test_decimal_clone_is_physically_decimal(spark, decimal_sf_dir):
    li = spark.read.parquet(f"{decimal_sf_dir}/lineitem.parquet")
    types = {f.name: f.dataType.simpleString() for f in li.schema.fields}
    for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
        assert types[c] == "decimal(15,2)", (c, types[c])


def test_registered_dsum_family_on_decimal_sources(spark, decimal_sf_dir):
    """The registered q_agg_groupby/dsum family runs UNCHANGED on decimal
    money columns and still hash-matches its DuckDB oracles — the round-7
    CAST(expr AS DOUBLE) entry point in dsum/sql_dsum (without it, DuckDB
    keeps the fixed-point chain in decimal arithmetic and overflows at
    DECIMAL(18))."""
    from etl_asana_spark import catalog
    from etl_asana_spark.testing import duckdb_connect

    qs, oracles = catalog.queries(), catalog.oracle_sql()
    con = duckdb_connect(decimal_sf_dir)
    try:
        failures = []
        for key in DSUM_FAMILY_KEYS:
            probs = compare_frames(
                qs[key](spark, decimal_sf_dir).toPandas(),
                con.execute(oracles[key]).fetchdf(),
            )
            if probs:
                failures.append((key, str(probs[0])[:140]))
        assert not failures, failures
    finally:
        con.close()
