"""Job-level profile of pipelines.curate_corpus — which Spark jobs the
uninstrumented bench run (curate_corpus(docs).curated.count()) actually
launches, and where the wall-clock goes.

The r10 verdict flagged the fuzzy build as "~8 sequential fixed-overhead
jobs"; this script replaces guessing with the UI REST API's job table
(name, description, submission/completion time) for one timed run.

Usage: python scripts/curation_profile.py [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_asana_spark import pipelines
from etl_asana_spark.registry import load_tables
from etl_asana_spark.session import build_session


def jobs_api(spark) -> list[dict]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs") as r:
        return json.loads(r.read())


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session(
        app_name="curation_profile",
        extra_confs={"spark.ui.enabled": "true", "spark.ui.port": "4047"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run() -> int:
        docs = load_tables(spark, sf_dir)["documents"]
        return pipelines.curate_corpus(docs).curated.count()

    run()  # warm-up
    n_before = len(jobs_api(spark))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    jobs = [j for j in jobs_api(spark) if j["jobId"] >= n_before]
    jobs.sort(key=lambda j: j["jobId"])
    print(f"runs: {[round(t, 3) for t in times]} min={min(times):.3f}s")
    print(f"jobs per run: {len(jobs) / repeats:.1f}")
    for j in jobs:
        dur = "?"
        if j.get("submissionTime") and j.get("completionTime"):
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            try:
                t0 = datetime.strptime(j["submissionTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                t1 = datetime.strptime(j["completionTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                dur = f"{(t1 - t0).total_seconds():.3f}s"
            except ValueError:
                pass
        print(
            f"  job {j['jobId']:>4} {dur:>8} stages={len(j.get('stageIds', []))} "
            f"tasks={j.get('numTasks')} {j.get('name', '')[:80]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
