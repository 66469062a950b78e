"""Engine benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Method mirrors BASELINE.md: per query one warm-up run, then REPEATS timed
runs with a full collect; the recorded per-query number is the MIN and the
per-query max−min lands in ``spread`` (r07 verdict item 4: a loaded host
must show up as variance, not as a phantom regression — r07's driver
reading swung 1.74× vs r06 with byte-identical plans purely from host
load). ``value`` is the total of per-query min seconds — directly
comparable against the PySpark column of BASELINE.md (bench bar = within
2×).

Round-to-round comparability caveat (the r01→r02 question, closed in round
3): BENCH_r01 recorded 1.99 s and BENCH_r02 3.15 s for identical plans — a
uniform ~1.58× across all six unrelated queries. Bisected on an idle round-3
machine: the round-2 code (commit f0f8602, which recorded 2.27 s at its own
commit time) ran at 3.05 s while round-3 HEAD ran 2.76–2.96 s on
back-to-back runs — i.e. the OLD code is not faster than the new code on the
same box; the per-round absolute numbers move with machine state (JIT/page
cache/CPU contention from the driver harness), not with the plans. Compare
ratios against BASELINE.md (measured the same session), not absolute seconds
across rounds.
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
#: ``value`` sums ONLY these — it is the number compared against the
#: BASELINE.md PySpark column (bar: within 2×), so its composition is fixed.
BENCH_KEYS = (
    "q_agg_groupby",      # pricing summary (filter + group-by agg on lineitem)
    "q_join_star",        # 4-way star join + agg
    "q_win_topk_group",   # row_number window, rank <= k
    "q_win_tumbling",     # hourly events window + count distinct + sum
    "q_topk",             # order by + limit 100
    "q_join_semi",        # IN-subquery → left-semi
)

#: Informational extras: not part of ``value`` (no BASELINE.md counterpart),
#: recorded so per-round bench files also track the engine's scan and
#: LLM-pipeline throughput at sf0.1.
EXTRA_KEYS = (
    "q_golden_revenue_forecast",  # pure scan speed: all predicates pushed
    "q_dedup_exact_docs",         # exact corpus dedup
    "q_text_tokens",              # tokenize + explode + count
    "q_dsir_weights",             # two-pass corpus stats + broadcast scoring
    "q_sim_cosine_topk",          # brute-force cosine top-k (HOF path)
    "q_stream_tumbling",          # bounded streaming drain: source listing +
                                  # state store + watermark emission overhead
    "q_multimodal",               # PNG encode → Arrow-batched stdlib decode →
                                  # feature extract (round-5 real-media tier)
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = build_session(app_name="etl_asana_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = catalog.queries()

    #: Timed repetitions per query (after one untimed warm-up). min-of-3:
    #: the minimum is the least-contended observation of a fixed plan, and
    #: the max−min spread quantifies how loaded the host was during the
    #: round's reading (r07 verdict item 4).
    REPEATS = 3
    spread: dict[str, float] = {}

    def timed_fn(label: str, run) -> float:
        """Warm-up once, time REPEATS runs of ``run()``, record the spread
        under ``label``, return the min — ONE definition of the method so
        the headline keys and the curation extra can never drift apart
        (r08 review)."""
        run()  # warm-up: JIT, code cache, file listing
        samples = []
        for _ in range(REPEATS):
            start = time.perf_counter()
            run()
            samples.append(time.perf_counter() - start)
        spread[label] = round(max(samples) - min(samples), 4)
        return round(min(samples), 4)

    def timed(key: str) -> float:
        fn = queries[key]
        return timed_fn(key, lambda: fn(spark, sf_dir).collect())

    # Bench-isolation record (r05 verdict items 2-3: two extras regressed
    # with zero code change; absolute numbers move with machine state).
    # loadavg BEFORE the run says what else the box was doing; the 1-min
    # value at start is the contention the first timings saw.
    load_before = os.getloadavg()

    timings = {k: timed(k) for k in BENCH_KEYS if k in queries}
    extras = {k: timed(k) for k in EXTRA_KEYS if k in queries}

    # Phase attribution for the bounded streaming drain (fixed setup vs
    # micro-batch work) — written by the drain that the last timed
    # q_stream_tumbling run executed.
    from etl_asana_spark.streaming import jobs as streaming_jobs

    stream_drain = dict(streaming_jobs.LAST_DRAIN_STATS)

    # Informational: the full corpus-curation composition (quality gate →
    # exact dedup → fuzzy dedup → PII scrub → split) end-to-end at sf0.1 —
    # pipeline throughput, not a single operator.
    from etl_asana_spark import pipelines
    from etl_asana_spark.registry import load_tables

    def curation_run() -> int:
        docs = load_tables(spark, sf_dir)["documents"]
        return pipelines.curate_corpus(docs).curated.count()

    extras["pipeline_curation"] = timed_fn("pipeline_curation", curation_run)

    # ONE instrumented pass (funnel counts force per-stage materialization)
    # for stage attribution — separate from the timed runs above, whose
    # number stays the uninstrumented end-to-end count().
    docs = load_tables(spark, sf_dir)["documents"]
    staged = pipelines.curate_corpus(docs, count_funnel=True)
    curation_stages = staged.stage_seconds or {}

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "extra_queries": extras,
                "repeats": REPEATS,
                "spread": spread,
                "stream_drain": stream_drain,
                "curation_stages": curation_stages,
                "loadavg_before": [round(x, 2) for x in load_before],
                "loadavg_after": [round(x, 2) for x in os.getloadavg()],
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
