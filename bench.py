"""Engine benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Method mirrors BASELINE.md: per query one warm-up run, second run timed with
a full collect. ``value`` is the total of per-query seconds — directly
comparable against the PySpark column of BASELINE.md (bench bar = within 2×).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_asana_spark import catalog
from etl_asana_spark.session import build_session

#: Headline set: the six BASELINE.md shapes, expressed as engine catalog keys.
BENCH_KEYS = (
    "q_agg_groupby",      # pricing summary (filter + group-by agg on lineitem)
    "q_join_star",        # 4-way star join + agg
    "q_win_topk_group",   # row_number window, rank <= k
    "q_win_tumbling",     # hourly events window + count distinct + sum
    "q_topk",             # order by + limit 100
    "q_join_semi",        # IN-subquery → left-semi
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = build_session(app_name="etl_asana_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = catalog.queries()
    keys = [k for k in BENCH_KEYS if k in queries]
    timings: dict[str, float] = {}
    for key in keys:
        fn = queries[key]
        fn(spark, sf_dir).collect()  # warm-up: JIT, code cache, file listing
        best = float("inf")
        for _ in range(2):  # min-of-2 timed runs damps scheduler noise
            start = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - start)
        timings[key] = round(best, 4)
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
