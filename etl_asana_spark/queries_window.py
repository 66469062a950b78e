"""Window-function queries (SURVEY.md §2.5, #33–#37).

Determinism discipline: row_number/ntile always carry a unique-key tiebreak
in ORDER BY; rank/dense_rank/percent_rank/cume_dist are shown over orderings
WITH ties (that is their semantic difference from row_number) — they are
deterministic because peers share values. Range frames order by
``unix_timestamp`` because Spark 4 rejects CAST(timestamp AS BIGINT) in a
range frame (SURVEY §2.5 #36, probe-verified fix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register
from .registry import load_tables

_DEC = "decimal(25,6)"


@register(
    "q_win_rank",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority,
           rank()         OVER tie AS rnk,
           dense_rank()   OVER tie AS drnk,
           CAST(percent_rank() OVER tie AS DOUBLE) AS prnk,
           CAST(cume_dist()    OVER tie AS DOUBLE) AS cdist,
           row_number()   OVER uniq AS rn,
           ntile(4)       OVER uniq AS quartile
    FROM orders
    WINDOW tie  AS (PARTITION BY o_orderstatus ORDER BY o_orderpriority),
           uniq AS (PARTITION BY o_orderstatus ORDER BY o_orderpriority, o_orderkey)
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#33 Ranking family: tie-aware ranks vs unique-ordered row numbering."""
    t = load_tables(spark, sf_dir)
    tie = Window.partitionBy("o_orderstatus").orderBy("o_orderpriority")
    uniq = Window.partitionBy("o_orderstatus").orderBy("o_orderpriority", "o_orderkey")
    return t["orders"].select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.rank().over(tie).alias("rnk"),
        F.dense_rank().over(tie).alias("drnk"),
        F.percent_rank().over(tie).cast("double").alias("prnk"),
        F.cume_dist().over(tie).cast("double").alias("cdist"),
        F.row_number().over(uniq).alias("rn"),
        F.ntile(4).over(uniq).alias("quartile"),
    )


@register(
    "q_win_lag",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           CAST(date_diff('day',
                          CAST(lag(o_orderdate) OVER w AS DATE),
                          CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#34 Analytic offsets: previous/next order price and inter-order gap."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "days_since_prev"
        ),
    )


@register(
    "q_win_running",
    oracle=f"""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend,
           COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS order_seq
    FROM orders
    """,
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#35 Rows-frame running total (decimal-exact, order-pinned)."""
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double").alias(
            "running_spend"
        ),
        F.count("*").over(w).alias("order_seq"),
    )


@register(
    "q_win_range",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS spend_30d,
           COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
           ) AS n_orders_30d
    FROM orders
    """,
)
def q_win_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#36 Range frame: trailing-30-day spend per customer.

    Spark orders the frame by ``unix_timestamp(o_orderdate)`` with a
    [-30d, 0] second range — Spark 4 rejects CAST(timestamp AS BIGINT)
    inside a range frame, and interval range frames need a numeric ordering
    column anyway. Range frames include peers, so no tiebreak is needed for
    determinism.
    """
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-86400 * 30, 0)
    )
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double").alias(
            "spend_30d"
        ),
        F.count("*").over(w).alias("n_orders_30d"),
    )


@register(
    "q_win_topk_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
               ) AS rk
        FROM orders
    ) WHERE rk <= 3
    """,
)
def q_win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#37 Top-k per group: rank-filter that Catalyst executes via
    WindowGroupLimit (per-partition k-heap before the full window sort)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        t["orders"]
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )
