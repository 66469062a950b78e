"""Dump the r11 verify/moment SUBPLANS that the registered queries hide.

Two of the r11 Arrow paths never appear in the registered query's
``explain``: q_dedup_semantic's pair verify sits behind a
``localCheckpoint`` boundary (the final plan scans the checkpoint RDD),
and q_emb_pca's moment pass is an eager ``collect()`` job executed at
construction time. This script dumps those stages' own plans — built by
calling the SAME operator entry points with the path forced each way —
so the committed plan evidence covers them (plans/r11/*_pairs_*.txt,
*_moments_*.txt).

Usage: python scripts/dump_r11_subplans.py [outdir] [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r11"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import functions as F

    from etl_asana_spark.operators import dedup
    from etl_asana_spark.operators.similarity import kmeans_lloyd
    from etl_asana_spark.plans import _plan_text
    from etl_asana_spark.registry import load_tables
    from etl_asana_spark.session import build_session

    spark = build_session(app_name="dump_r11_subplans")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)

    def write(name: str, df) -> None:
        path = os.path.join(outdir, f"{name}.txt")
        with open(path, "w") as fh:
            fh.write(_plan_text(df))
        print("wrote", path)

    # --- q_dedup_semantic pair verify (the stage behind the checkpoint) --
    emb = t["embeddings"]
    assigned = kmeans_lloyd(
        emb, k=16, n_iter=2, model_key=f"{sf_dir}:embeddings"
    ).select("vec_id", "cluster")
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).join(assigned, "vec_id")
    base = vecs.select(
        F.col("cluster"), F.col("vec_id").alias("id"), F.col("v").alias("vec")
    )
    groups, _membership = dedup._collapse_exact(
        base, "id", "vec", group_cols=("cluster",)
    )
    # JVM form: the pair join exactly as semantic_dedup_stats builds it.
    from etl_asana_spark.functions.vector import cosine

    ga = groups.select(
        "cluster",
        F.col("rep").alias("rep_a"),
        F.col("vec").alias("va"),
        F.col("cnt").alias("cnt_a"),
    ).repartition(
        max(spark.sparkContext.defaultParallelism, 8), "cluster"
    )
    gb = groups.select(
        "cluster",
        F.col("rep").alias("rep_b"),
        F.col("vec").alias("vb"),
        F.col("cnt").alias("cnt_b"),
    )
    jvm_pairs = (
        ga.join(gb, "cluster")
        .filter(F.col("rep_a") < F.col("rep_b"))
        .withColumn("cos", cosine("va", "vb"))
        .filter(F.col("cos") >= 0.28)
        .select("cluster", "rep_a", "rep_b", "cnt_a", "cnt_b")
    )
    write("q_dedup_semantic_pairs_jvm", jvm_pairs)
    write(
        "q_dedup_semantic_pairs_arrow",
        dedup._arrow_cluster_pair_stats(groups, 0.28),
    )

    # --- q_emb_pca moment pass (the construction-time collect job) -------
    from etl_asana_spark.operators import similarity  # noqa: F401

    x = emb.filter(F.col("embedding").isNotNull())
    d = x.select(F.max(F.size("embedding")).alias("d")).first()["d"]
    x = x.filter(F.size("embedding") == d)
    e = F.col("embedding").cast("array<double>")
    prods = F.expr(
        "concat("
        " flatten(transform(sequence(1, __d), i -> "
        "  transform(sequence(i, __d), j -> "
        "   struct(i AS i, j AS j, element_at(__e, i) * element_at(__e, j) AS p)))),"
        " transform(sequence(1, __d), i -> "
        "  struct(i AS i, 0 AS j, element_at(__e, i) AS p)),"
        " array(struct(0 AS i, 0 AS j, CAST(1.0 AS DOUBLE) AS p)))"
    )
    jvm_moments = (
        x.select(e.alias("__e"), F.lit(d).alias("__d"))
        .select(F.explode(prods).alias("c"))
        .groupBy(F.col("c.i").alias("i"), F.col("c.j").alias("j"))
        .agg(F.sum("c.p").alias("s"))
    )
    write("q_emb_pca_moments_jvm", jvm_moments)

    def partial_moments(batches):  # shape-only twin of the operator's kernel
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            n = rb.num_rows
            yield pa.record_batch(
                {
                    "i": np.zeros(0, dtype="int32"),
                    "j": np.zeros(0, dtype="int32"),
                    "s": np.zeros(0),
                }
            )

    arrow_moments = (
        x.select(e.alias("__e"))
        .mapInArrow(partial_moments, "i int, j int, s double")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
    )
    write("q_emb_pca_moments_arrow", arrow_moments)

    # --- minhash / simhash signature stages (behind lazy checkpoints) ----
    from etl_asana_spark.operators.text import poly_hash, shingles

    docs = t["documents"]
    p = F.lit(dedup._MINHASH_P)
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda tk: tk != F.lit(""))
    base = (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", toks.alias("__toks"))
        .select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    shingles("__toks", 3), lambda s: poly_hash(s) % p
                )
            ).alias("__hs"),
        )
        .filter(F.size("__hs") > 0)
    )
    jvm_sigs = base.select(
        "doc_id",
        "__hs",
        *[
            F.array_min(
                F.transform("__hs", lambda h: (h * F.lit(a) + F.lit(b)) % p)
            ).alias(f"__mh{i}")
            for i, (a, b) in enumerate(dedup._MINHASH_COEFFS)
        ],
    )
    write("q_dedup_minhash_sigs_jvm", jvm_sigs)
    pre = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", toks.alias("__toks")
    ).select("doc_id", shingles("__toks", 3).alias("__sh"))
    write(
        "q_dedup_minhash_sigs_arrow",
        dedup._arrow_minhash_signatures(pre, "doc_id").filter(
            F.size("__hs") > 0
        ),
    )
    write(
        "q_dedup_simhash_sigs_jvm",
        dedup.simhash_portable_signatures(docs),
    )
    write(
        "q_dedup_simhash_sigs_arrow",
        dedup.simhash_portable_signatures(docs, batched_sig=True),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
