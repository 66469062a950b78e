"""Capture .explain('formatted') output per catalog key into a directory.

Usage: python scripts/capture_plans.py OUTDIR SUFFIX [key ...]

With no keys, captures the bench set (headline six + extras). Writes
OUTDIR/<key>_<SUFFIX>.txt. Plans are captured at $SPARK_GRAFT_SF_DIR
(default sf0.1) through the engine session, exactly as bench.py runs them —
so Exchange counts / join strategies / PushedFilters in these files match
what the bench timed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_SET = [
    "q_agg_groupby",
    "q_join_star",
    "q_win_topk_group",
    "q_win_tumbling",
    "q_topk",
    "q_join_semi",
    "q_golden_revenue_forecast",
    "q_dedup_exact_docs",
    "q_text_tokens",
    "q_dsir_weights",
    "q_sim_cosine_topk",
    "q_multimodal",
]


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:] or BENCH_SET
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from etl_asana_spark import catalog
    from etl_asana_spark.session import build_session

    spark = build_session(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = catalog.queries()
    for key in keys:
        if key not in queries:
            print(f"SKIP {key}: not registered")
            continue
        df = queries[key](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{key}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
