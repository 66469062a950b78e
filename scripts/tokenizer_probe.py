"""Probe: oracle parity for text-tokenizing keys on a MESSY-whitespace corpus.

The r05 advice flagged q_pack_sequences/q_text_fingerprint oracles tokenizing
with ``string_split(text, ' ')`` while the engine splits on ``\\s+`` — latent
only because the shipped corpora are single-spaced. This probe rewrites
documents.text (and part.p_name) with tabs/newlines/double-spaces and runs
every tokenizing key against its oracle, printing each divergence.

Usage: python scripts/tokenizer_probe.py [key ...]
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from etl_asana_spark import catalog  # noqa: E402
from etl_asana_spark.testing import compare_frames, duckdb_connect  # noqa: E402

SRC = "/root/testdata/sf0.001"

WORDS = (
    "the quick brown fox jumps over lazy dog stream spark window table scan "
    "merge sort hash join order batch part key small dup le chat et la table"
).split()


def messy_text(rng: random.Random, n_words: int) -> str:
    seps = [" ", "  ", "\t", "\n", "   ", " \t ", "\r\n"]
    out = []
    if rng.random() < 0.3:
        out.append(rng.choice([" ", "\t", "  "]))
    for i in range(n_words):
        out.append(rng.choice(WORDS))
        if i < n_words - 1:
            out.append(rng.choice(seps))
    if rng.random() < 0.3:
        out.append(rng.choice([" ", "\n", " \t"]))
    return "".join(out)


def build_dir(dst: str) -> None:
    rng = random.Random(607)
    for name in os.listdir(SRC):
        t = pq.read_table(f"{SRC}/{name}")
        if name == "documents.parquet":
            texts = [messy_text(rng, rng.randint(3, 40)) for _ in range(len(t))]
            cols = {}
            for f in t.schema:
                if f.name == "text":
                    cols[f.name] = pa.array(texts, f.type)
                elif f.name == "n_chars":
                    cols[f.name] = pa.array([len(s) for s in texts], f.type)
                else:
                    cols[f.name] = t[f.name]
            t = pa.table(cols, schema=t.schema)
        elif name == "part.parquet":
            names = [
                messy_text(rng, rng.randint(2, 5)) for _ in range(len(t))
            ]
            t = pa.table(
                {
                    f.name: (pa.array(names, f.type) if f.name == "p_name" else t[f.name])
                    for f in t.schema
                },
                schema=t.schema,
            )
        pq.write_table(t, f"{dst}/{name}")


def main() -> int:
    only = set(sys.argv[1:])
    dst = tempfile.mkdtemp(prefix="messy_sf_")
    build_dir(dst)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connect(dst)
    qs = catalog.queries()
    oracles = catalog.oracle_sql()
    keys = [
        k
        for k, sql in oracles.items()
        if ("string_split(" in sql or "regexp_split_to_array(" in sql)
    ]
    n_fail = 0
    for key in keys:
        if only and key not in only:
            continue
        try:
            pdf = qs[key](spark, dst).toPandas()
            probs = compare_frames(pdf, con.execute(oracles[key]).fetchdf())
        except Exception as exc:  # noqa: BLE001
            probs = [f"{type(exc).__name__}: {exc}"]
        if probs:
            n_fail += 1
            print(f"FAIL {key:32s} {str(probs[0])[:160]}")
        else:
            print(f"PASS {key}")
    print(f"\n{n_fail} divergent keys")
    shutil.rmtree(dst, ignore_errors=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
