"""Off-list fuzz scan: every seed-parametrized fuzz test × N FRESH seeds.

Usage:  python scripts/offlist_fuzz.py [--seeds N] [--base B]

The suite pins its fuzz seeds (reproducibility), which means a green suite
proves exactly those draws. Each round's closing battery re-runs every
seed-parametrized test in tests/test_fuzz_differential.py and
tests/test_streaming.py with seeds the suite has NEVER used (``--base``
upward — pick a base no prior round used; rounds 4/5 burned 5000–5019 and
8100–8119), so the differential harnesses keep proving the OPERATORS, not
the seed list. Prior rounds did this with ad-hoc inline runs; this script
makes the scan reproducible and countable.

Calls the test functions directly (not via pytest) with real fixtures, so
a failure raises with the seed in the traceback. Exits non-zero on any
failure; prints one line per (test, seed).
"""

from __future__ import annotations

import argparse
import inspect
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--base", type=int, default=20600)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from etl_asana_spark.session import build_session
    from etl_asana_spark.testing import duckdb_connect

    spark = build_session(app_name="offlist-fuzz")
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb_connect(args.sf_dir)

    fixtures = {"spark": spark, "duck": duck, "sf_dir": args.sf_dir}
    import test_fuzz_differential as tfd
    import test_streaming as tst

    tests = []
    for mod in (tfd, tst):
        for name, fn in sorted(vars(mod).items()):
            if not (name.startswith("test_") and callable(fn)):
                continue
            params = list(inspect.signature(fn).parameters)
            if "seed" not in params:
                continue
            if not set(params) <= set(fixtures) | {"seed"}:
                print(f"SKIP {name}: unknown fixtures {params}")
                continue
            tests.append((name, fn, params))

    n_fail, n_run = 0, 0
    t0 = time.perf_counter()
    for name, fn, params in tests:
        for seed in range(args.base, args.base + args.seeds):
            kwargs = {p: fixtures[p] for p in params if p != "seed"}
            n_run += 1
            try:
                fn(seed=seed, **kwargs)
                status = "PASS"
            except Exception as exc:  # noqa: BLE001
                status = f"FAIL {type(exc).__name__}: {str(exc)[:120]}"
                n_fail += 1
            print(f"{status:4.4s} {name} seed={seed}"
                  + ("" if status == "PASS" else f"  {status[5:]}"))
    dt = time.perf_counter() - t0
    print(f"\n{len(tests)} tests × {args.seeds} fresh seeds = {n_run} cases, "
          f"{n_fail} failures, {dt:.1f}s")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
