"""Plain-session driver emulation: run the gate the way the DRIVER runs it.

Usage:  python scripts/driver_emulation.py [sf_dir] [--prefix N]

Differences from scripts/sweep.py (the strict local mirror):
- the SparkSession is built with NO engine confs at all — exactly the driver's
  session shape (``SparkSession.builder.master(...)``, default 200 shuffle
  partitions, no nanosAsLong/UTC settings). The registry must self-apply every
  runtime conf it needs; a key that only passes under sweep.py's tuned session
  would be red at the external gate.
- keys run through ``__spark_entry__`` (the literal driver import surface),
  not ``catalog`` directly.
- ``--prefix N`` runs only the first N rotation-ordered keys — the projected
  budgeted prefix the external gate will verify next round. Pre-verifying that
  exact prefix is the round's first closing gate (VERDICT r04 next-round #1).

Comparison logic is shared with sweep.py (driver-style canon + kind-strict
frames_match) so a pass here means the same thing it means there.

Exits non-zero on any failure.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from sweep import canon, frames_match  # noqa: E402


def main() -> int:
    prefix = None
    args = list(sys.argv[1:])
    if "--prefix" in args:
        i = args.index("--prefix")
        prefix = int(args[i + 1])
        # consume the VALUE too — it must not leak into the positional
        # sf_dir (running `--prefix 50` otherwise reads sf_dir="50")
        del args[i : i + 2]
    argv = [a for a in args if not a.startswith("--")]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    # The driver's session: plain. No shuffle-partition tuning, no parquet
    # nanos conf, no timezone pin. Anything the engine needs must come from
    # registry.load_tables' self-applied confs.
    spark = SparkSession.builder.master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod  # noqa: E402

    from etl_asana_spark.testing import duckdb_connect  # noqa: E402

    smoke = entry_mod.entry(spark)
    n_smoke = smoke.count()
    print(f"entry() smoke: {n_smoke} rows, schema {[f.name for f in smoke.schema]}")
    if n_smoke <= 0:
        print("FAIL entry() returned no rows")
        return 1

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    keys = list(qs)
    if prefix is not None:
        keys = keys[:prefix]
    con = duckdb_connect(sf_dir)

    n_fail = 0
    total_t = 0.0
    for i, key in enumerate(keys):
        t0 = time.perf_counter()
        try:
            pdf = qs[key](spark, sf_dir).toPandas()
            sql = oracles.get(key)
            if sql is None:
                canon(pdf)  # the driver canonicalizes rows-only frames too
                problem = None
                status = f"rows-only ({len(pdf)} rows)"
                if len(pdf) == 0 and key != "q_join_anti":
                    problem = "0 rows from a rows-only key"
            else:
                problem = frames_match(pdf, con.execute(sql).fetchdf())
                status = f"ok ({len(pdf)} rows)"
        except Exception as exc:  # noqa: BLE001
            problem = f"{type(exc).__name__}: {exc}"
            status = "error"
        dt = time.perf_counter() - t0
        total_t += dt
        if problem:
            n_fail += 1
            print(f"FAIL [{i:3d}] {key:32s} {dt:6.2f}s  {problem}")
        else:
            print(f"PASS [{i:3d}] {key:32s} {dt:6.2f}s  {status}")
    print(f"\n{len(keys)} keys, {n_fail} failures, {total_t:.1f}s total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
