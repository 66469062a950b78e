"""Scale rehearsal: run headline queries at N× the largest driver scale.

The driver's testdata tops out at sf0.1 (~600 k lineitem rows). This script
materializes an N×-replicated copy (default N=10 → ~sf1, ~6 M lineitem rows)
by FK-CONSISTENT replication — each replica shifts every key family by a
disjoint span so primary keys stay unique and every join still matches
within its replica (the data grows the way a real warehouse grows: more
orders/lineitems/events/docs, same region/nation dims) — then times the
bench headline queries at both scales and prints the scaling ratio per
query.

Purpose: empirical evidence for the 100 TB design review. A query whose
cost grows ~N× (or less, where TakeOrdered/partial-agg bounds work) for N×
data has no hidden superlinear path at the next scale-up; a query growing
≫N× would be flagged here before any real cluster sees it.

Usage:  python scripts/scale_rehearsal.py [--replicas 10] [--runs 2]

Writes the replicated tables to a temp dir (removed on exit unless
--keep). Input: /root/testdata/sf0.1 (read-only, never modified).
"""

from __future__ import annotations

import argparse
import atexit
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

#: Per-replica shift spans, comfortably above each key family's max value.
SPANS = {
    "orderkey": 100_000_000,
    "custkey": 10_000_000,
    "partkey": 10_000_000,
    "suppkey": 1_000_000,
    "event_id": 100_000_000,
    "user_id": 10_000_000,
    "doc_id": 10_000_000,
    "vec_id": 10_000_000,
}

#: Key columns to shift per table (FK families shift together, so each
#: replica is a self-consistent star; dims region/nation copy unshifted).
TABLE_KEYS = {
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "customer": {"c_custkey": "custkey"},
    "part": {"p_partkey": "partkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
    "region": {},
    "nation": {},
}

HEADLINE = [
    "q_agg_groupby", "q_join_star", "q_win_topk_group", "q_win_tumbling",
    "q_topk", "q_join_semi",
    # LLM-pipeline extras worth rehearsing (docs/embeddings replicate too)
    "q_dedup_exact_docs", "q_text_tokens", "q_sim_cosine_topk",
]


def replicate(spark, src: str, dst: str, n: int, neardup: bool = False) -> None:
    from pyspark.sql import functions as F

    from etl_asana_spark.operators.similarity import reset_lloyd_model_cache
    from etl_asana_spark.operators.topk import reset_group_stats_cache

    # Re-writing {dst}/*.parquet invalidates anything fitted/probed against
    # this path earlier in the process (r09 advice: path-derived cache keys
    # trust the caller to pin input identity).
    reset_lloyd_model_cache(f"{dst}:embeddings")
    reset_group_stats_cache(f"{dst}:orders")

    for name, keys in TABLE_KEYS.items():
        df = spark.read.parquet(f"{src}/{name}.parquet")
        if keys and n > 1:
            reps = spark.range(n).withColumnRenamed("id", "__r")
            df = df.crossJoin(F.broadcast(reps))
            for col, fam in keys.items():
                df = df.withColumn(
                    col, (F.col(col) + F.col("__r") * SPANS[fam]).cast("long")
                )
            if neardup and name == "documents":
                # Replica 0 keeps the original text; each other replica
                # appends a tiny per-replica suffix. Exact replication makes
                # every copy a BYTE-identical duplicate, which the curation
                # pipeline's exact-dedup stage (xxhash64 grouping) kills
                # before the fuzzy stage ever sees it — so replicated-scale
                # fuzzy timings would measure nothing. The suffix keeps
                # trigram Jaccard between replicas high (one changed
                # shingle out of hundreds), so the fuzzy stage faces n-way
                # NEAR-dup clusters: C(n,2)× candidate-pair growth per
                # cluster — the blocking join's and the CC loop's actual
                # stress shape.
                df = df.withColumn(
                    "text",
                    F.when(F.col("__r") == 0, F.col("text")).otherwise(
                        F.concat(F.col("text"), F.lit(" replica"),
                                 F.col("__r").cast("string"))
                    ),
                )
            if neardup and name == "embeddings":
                # Vector twin of the text perturbation (r10: exact-copy
                # replication was collapsed by the embed family's
                # duplicate-vector collapse, so replicated-scale embed
                # timings measured nothing — the 10×/30× "flat" readings).
                # Nudge ONE component per non-zero replica by a tiny
                # deterministic delta: replicas stay near-identical in
                # cosine (≫ any near-dup threshold → C(n,2) true pairs per
                # family) but are no longer byte-identical, so the fuzzy
                # path does real work. Kept FLOAT so the written schema
                # matches the driver corpus.
                delta = (F.col("__r").cast("double") * F.lit(1e-3))
                df = df.withColumn(
                    "embedding",
                    F.when(F.col("__r") == 0, F.col("embedding")).otherwise(
                        F.transform(
                            "embedding",
                            lambda x, i: (
                                x.cast("double")
                                + F.when(
                                    i == F.pmod(F.col("__r"),
                                                F.size("embedding")),
                                    delta,
                                ).otherwise(F.lit(0.0))
                            ).cast("float"),
                        )
                    ),
                )
            df = df.drop("__r")
        df.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")


def skew_fact(spark, dst: str, frac: float) -> None:
    """Remap ``frac`` of lineitem rows onto ONE hot l_orderkey (the corpus
    minimum, which exists in orders — FK-consistent) — the production
    hot-tenant/hot-day shape. A PERF rehearsal twist: the join answers
    change (that's fine, we time, we don't oracle-check skewed data); what
    must NOT happen is a single straggler task holding the whole stage —
    AQE's skew-join split (enabled in the engine confs) is the mechanism
    under test."""
    import os
    import shutil

    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{dst}/lineitem.parquet")
    hot = li.agg(F.min("l_orderkey")).collect()[0][0]
    (
        li.withColumn(
            "l_orderkey",
            F.when(F.rand(seed=42) < frac, F.lit(hot).cast("long")).otherwise(
                F.col("l_orderkey")
            ),
        ).write.mode("overwrite").parquet(f"{dst}/lineitem_skew.parquet")
    )
    shutil.rmtree(f"{dst}/lineitem.parquet")
    os.rename(f"{dst}/lineitem_skew.parquet", f"{dst}/lineitem.parquet")


def time_key(qs, spark, key: str, sf_dir: str, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def topk_ab(spark, sf_dir: str, runs: int) -> dict:
    """A/B/C the q_win_topk_group plan at the rehearsal scale (r07 verdict
    item 5: the worst 100× multiplier, diagnosed as the pre-/post-shuffle
    sort spilling in one wave at fixed shuffle-partition count).

    A = the registered plan (row_number window, WindowGroupLimit).
    B = salted two-phase: top-k per (group, salt) window first — each salted
        sort is 1/S the rows — then the real window over survivors only.
        Exact: the global top-k per group is contained in the union of
        per-salt top-k; the final window re-ranks identically (same total
        order, ties broken by o_orderkey).
    C = the registered plan over a repartition(8×cores, group) input — same
        single window, finer hash partitioning, so each sort fits memory
        (what a real cluster gets for free when shuffle partitions scale
        with the data; AQE cannot SPLIT a sort partition upward).

    All three are value-checked identical (count + rank checksum) before
    timing; prints per-variant seconds and returns them.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    order_by = (F.desc("o_totalprice"), F.asc("o_orderkey"))
    w = Window.partitionBy("o_custkey").orderBy(*order_by)

    def variant_a():
        return (
            orders.select("o_custkey", "o_orderkey", "o_totalprice",
                          F.row_number().over(w).alias("rk"))
            .filter(F.col("rk") <= 3)
        )

    def variant_b():
        ws = Window.partitionBy("o_custkey", "__salt").orderBy(*order_by)
        pre = (
            orders.withColumn("__salt", F.pmod(F.col("o_orderkey"), F.lit(16)))
            .select("o_custkey", "o_orderkey", "o_totalprice", "__salt",
                    F.row_number().over(ws).alias("__prk"))
            .filter(F.col("__prk") <= 3)
            .drop("__salt", "__prk")
        )
        return (
            pre.select("o_custkey", "o_orderkey", "o_totalprice",
                       F.row_number().over(w).alias("rk"))
            .filter(F.col("rk") <= 3)
        )

    def variant_c():
        n = spark.sparkContext.defaultParallelism * 8
        return (
            orders.repartition(n, "o_custkey")
            .select("o_custkey", "o_orderkey", "o_totalprice",
                    F.row_number().over(w).alias("rk"))
            .filter(F.col("rk") <= 3)
        )

    variants = {"a_window": variant_a, "b_salted2p": variant_b,
                "c_repart8x": variant_c}
    # Value check first: identical (count, checksum-of-ranked-keys).
    sigs = {}
    for name, fn in variants.items():
        sig = fn().agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_orderkey") * F.col("rk")).alias("chk"),
        ).collect()[0]
        sigs[name] = (sig["n"], sig["chk"])
    assert len(set(sigs.values())) == 1, f"variants disagree: {sigs}"

    times = {}
    for name, fn in variants.items():
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)
        print(f"topk_ab {name:12s} {best:7.3f}s", file=sys.stderr)
    return times


def pipeline_ab(spark, src: str, dst: str) -> dict:
    """Time curate_corpus's stage funnel at base scale and at the
    replicated scale (r08 verdict item 3: the fuzzy stage's CC-loop round
    count and blocking-join candidate volume are the two things that could
    go super-linear). Returns per-stage seconds at both scales plus
    ratios. Run with --neardup replication — exact replication's copies
    die at the exact-dedup stage and the fuzzy stage sees no growth."""
    from etl_asana_spark import pipelines
    from etl_asana_spark.registry import load_tables

    out = {}
    for tag, d in (("base", src), ("big", dst)):
        docs = load_tables(spark, d)["documents"]
        t0 = time.perf_counter()
        res = pipelines.curate_corpus(docs, count_funnel=True)
        out[tag] = {
            "stages": res.stage_seconds,
            "funnel": res.funnel,
            "total": round(time.perf_counter() - t0, 3),
        }
        print(f"pipeline {tag}: total {out[tag]['total']}s "
              f"stages {res.stage_seconds}", file=sys.stderr)
    ratios = {
        k: round(out["big"]["stages"][k] / out["base"]["stages"][k], 2)
        for k in out["base"]["stages"]
        if out["base"]["stages"][k] > 0
    }
    out["stage_ratios"] = ratios
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--neardup", action="store_true",
                    help="perturb each replica's document text so copies "
                         "are NEAR-duplicates (fuzzy-dedup stress) instead "
                         "of exact ones (which exact dedup collapses)")
    ap.add_argument("--pipeline", action="store_true",
                    help="time curate_corpus's stage funnel at both scales "
                         "instead of the normal key sweep")
    ap.add_argument("--skew", type=float, default=0.0,
                    help="after replication, remap this fraction of "
                         "lineitem rows onto one hot l_orderkey (perf "
                         "rehearsal for AQE skew-join; answers change, "
                         "timings are the point)")
    ap.add_argument("--keys", nargs="*", default=None,
                    help="override the headline key list (e.g. the dedup "
                         "family — note replication makes every doc an "
                         "exact 10-way duplicate, a worst-case dedup load)")
    ap.add_argument("--topk-ab", action="store_true",
                    help="after replication, A/B the q_win_topk_group plan "
                         "variants at the big scale instead of the normal "
                         "key sweep (r07 verdict item 5)")
    args = ap.parse_args()

    from etl_asana_spark import catalog
    from etl_asana_spark.session import build_session

    spark = build_session(app_name="scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    dst = tempfile.mkdtemp(prefix="scale_rehearsal_")
    if not args.keep:
        atexit.register(shutil.rmtree, dst, True)
    t0 = time.perf_counter()
    replicate(spark, args.src, dst, args.replicas, neardup=args.neardup)
    if args.skew > 0:
        skew_fact(spark, dst, args.skew)
        print(f"skewed: {args.skew:.0%} of lineitem on one hot l_orderkey")
    print(f"replicated {args.replicas}x into {dst} "
          f"({time.perf_counter() - t0:.1f}s)", file=sys.stderr)

    if args.topk_ab:
        times = topk_ab(spark, dst, args.runs)
        print(json.dumps({"replicas": args.replicas, "topk_ab": times}))
        return 0

    if args.pipeline:
        res = pipeline_ab(spark, args.src, dst)
        print(json.dumps({"replicas": args.replicas,
                          "neardup": args.neardup, "pipeline": res}))
        return 0

    qs = catalog.queries()
    base, big, ratio = {}, {}, {}
    for key in (args.keys or HEADLINE):
        base[key] = round(time_key(qs, spark, key, args.src, args.runs), 3)
        big[key] = round(time_key(qs, spark, key, dst, args.runs), 3)
        ratio[key] = round(big[key] / base[key], 2)
        print(f"{key:22s} sf0.1 {base[key]:7.3f}s  x{args.replicas} "
              f"{big[key]:7.3f}s  ratio {ratio[key]:5.2f}", file=sys.stderr)
    print(json.dumps({
        "replicas": args.replicas,
        "base_total": round(sum(base.values()), 3),
        "big_total": round(sum(big.values()), 3),
        "ratios": ratio,
    }))
    # a ratio far above the replica count means a superlinear path
    worst = max(ratio.values())
    return 1 if worst > args.replicas * 2 else 0


if __name__ == "__main__":
    raise SystemExit(main())
