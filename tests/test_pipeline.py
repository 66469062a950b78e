"""End-to-end ETL pipeline: full-program semantics and idempotence."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from etl_asana_spark import pipelines
from etl_asana_spark.sources.fixtures import FIXTURES_DIR, N_NEW, N_TASKS
from etl_asana_spark.testing import canonical_rows


def test_etl_end_to_end_counts_and_keys(spark):
    r = pipelines.run_asana_etl(spark)
    counts = r.row_counts()
    assert counts["tasks"] == N_TASKS + N_NEW  # one row per distinct gid
    assert r.tasks.select("gid").distinct().count() == counts["tasks"]
    # bridges reference only surviving tasks
    gids = {row["gid"] for row in r.tasks.select("gid").collect()}
    assert {row["task_gid"] for row in r.task_tags.collect()} <= gids
    assert {row["task_gid"] for row in r.task_memberships.collect()} == gids
    assert counts["task_custom_fields"] == counts["tasks"]
    assert r.checkpoint >= "2024-01-20"  # batch2 modified_at dominates


def test_etl_idempotent_replay(spark):
    """Running the sync again on top of its own output changes nothing."""
    first = pipelines.run_asana_etl(spark)
    second = pipelines.run_asana_etl(spark, prior_tasks=first.tasks)
    for attr in ("tasks", "task_tags", "task_custom_fields"):
        a, b = getattr(first, attr), getattr(second, attr)
        assert canonical_rows(a.toPandas()) == canonical_rows(b.toPandas()), attr
    assert second.checkpoint == first.checkpoint


def test_etl_incremental_equals_full(spark):
    """batch1-then-batch2 incrementally == both batches at once."""
    d = FIXTURES_DIR
    full = pipelines.run_asana_etl(
        spark, [d / "tasks_batch1.ndjson", d / "tasks_batch2.ndjson"]
    )
    step1 = pipelines.run_asana_etl(spark, [d / "tasks_batch1.ndjson"])
    step2 = pipelines.run_asana_etl(
        spark, [d / "tasks_batch2.ndjson"], prior_tasks=step1.tasks
    )
    assert canonical_rows(step2.tasks.toPandas()) == canonical_rows(full.tasks.toPandas())


def test_etl_outputs_written_and_typed(spark):
    r = pipelines.run_asana_etl(spark)
    out = tempfile.mkdtemp(prefix="etl_out_")
    pipelines.write_etl_outputs(r, out)
    tasks = spark.read.parquet(f"{out}/tasks")
    assert dict(tasks.dtypes)["created_ts"] == "timestamp"
    assert tasks.count() == r.tasks.count()
    assert spark.read.parquet(f"{out}/task_tags").count() == r.task_tags.count()


# ---------------------------------------------------------------------------
# Corpus-curation pipeline (pipelines.curate_corpus)
# ---------------------------------------------------------------------------


def _docs(spark, sf_dir):
    from etl_asana_spark.registry import load_tables

    return load_tables(spark, sf_dir)["documents"]


def test_curation_funnel_monotone_and_splits_partition(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 50 == 7).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    r = pipelines.curate_corpus(docs, bench_docs=bench, count_funnel=True)
    f = r.funnel
    assert f["raw"] >= f["quality"] >= f["exact_dedup"] >= f["fuzzy_dedup"]
    assert f["fuzzy_dedup"] >= f["decontaminated"] == f["curated"]
    assert f["curated"] > 0
    # Near-dedup trims a tail, it must not collapse the corpus: the old
    # 0.015 pair-finding default connected everything through shared
    # vocabulary and left 2 survivors from 2413 at sf0.1.
    assert f["fuzzy_dedup"] >= 0.5 * f["exact_dedup"]
    # split column partitions the survivors (fractions sum to 1 here)
    by_split = {
        row["split"]: row["count"]
        for row in r.curated.groupBy("split").count().collect()
    }
    assert None not in by_split
    assert sum(by_split.values()) == f["curated"]
    assert set(by_split) <= {"train", "val", "test"}
    assert by_split.get("train", 0) > by_split.get("val", 0)


def test_curation_deterministic_across_runs(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = pipelines.curate_corpus(docs).curated
    b = pipelines.curate_corpus(docs.repartition(7)).curated
    ca, cb = canonical_rows(a.toPandas()), canonical_rows(b.toPandas())
    assert ca == cb  # identical rows regardless of input partitioning


def test_curation_idempotent(spark, sf_dir):
    """Curating an already-curated corpus is a no-op: every quality gate
    passes, no duplicate pair survives, no PII is left to scrub, and the
    hash split assigns every doc the same slice. The curated frame is fed
    back VERBATIM — curate_corpus itself must replace (not duplicate) its
    derived n_tokens/split columns."""
    docs = _docs(spark, sf_dir)
    once = pipelines.curate_corpus(docs).curated
    again = pipelines.curate_corpus(once).curated
    assert again.columns == once.columns  # no duplicated derived columns
    a = canonical_rows(once.toPandas())
    b = canonical_rows(again.toPandas())
    assert a == b


def test_curation_rejects_overcommitted_splits(spark, sf_dir):
    import pytest

    docs = _docs(spark, sf_dir)
    with pytest.raises(ValueError):
        pipelines.curate_corpus(
            docs, splits={"train": 0.9, "val": 0.1, "test": 0.05}
        )


def test_curation_collapses_planted_near_dups(spark):
    """Two docs differing by one word (trigram Jaccard far above 0.5) must
    collapse to the canonical survivor (smallest doc_id); an unrelated doc
    must survive alongside it."""
    def base(tag):
        return " ".join(f"the {tag}{i} and item{tag}{i} of" for i in range(15))

    near_a = base("alpha") + " final shared closing words here"
    near_b = base("alpha") + " final shared closing words there"
    rows = [
        (10, "web", "en", near_a),
        (20, "web", "en", near_b),
        (30, "web", "en", base("gamma") + " a different document entirely"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, source string, lang string, text string"
    )
    kept = {r["doc_id"] for r in pipelines.curate_corpus(docs).curated.collect()}
    assert kept == {10, 30}


def test_curation_scrubs_planted_pii(spark):
    # 60+ words with stopwords (English quality gate), and per-doc DISTINCT
    # bases so the fuzzy-dedup stage does not collapse the three docs
    def base(tag):
        return " ".join(f"the {tag}{i} and item{tag}{i} of" for i in range(15))

    rows = [
        (1, "web", "en", base("alpha") + " contact bob.smith@corp.example now"),
        (2, "web", "en", base("beta") + " call +1-555-0147 today"),
        (3, "web", "en", base("gamma") + " the clean control document"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, lang string, text string")
    out = {r["doc_id"]: r["text"] for r in pipelines.curate_corpus(docs).curated.collect()}
    assert "<EMAIL>" in out[1] and "@" not in out[1]
    assert "<PHONE>" in out[2] and "555" not in out[2]
    assert "<" not in out[3]


def test_curation_crash_after_cc_is_idempotent(spark, sf_dir):
    """r08 verdict item 6: streaming has crash-injected recovery; pin the
    BATCH pipeline's failure idempotence too. Kill curate_corpus between
    the fuzzy stage's eager connected-components materialization and the
    downstream stages (exception injected after the CC loop has launched
    its jobs and materialized checkpoints), then re-run uninterrupted —
    the output must equal a never-interrupted run. The crash leaves only
    session-temp state (localCheckpoint blocks, scratch dirs); nothing
    durable may leak into the retry."""
    import pytest

    docs = _docs(spark, sf_dir)
    reference = canonical_rows(pipelines.curate_corpus(docs).curated.toPandas())

    real_cc = pipelines.ngram_dedup_clusters

    class _InjectedCrash(RuntimeError):
        pass

    def crashing_cc(exact, **kw):
        clusters = real_cc(exact, **kw)
        # Force the CC loop's eager materialization (the component loop
        # localCheckpoints intermediates), THEN die — the verdict's exact
        # crash point: after stage 3's jobs ran, before the final stages.
        clusters.count()
        raise _InjectedCrash("injected crash after CC materialization")

    pipelines.ngram_dedup_clusters = crashing_cc
    try:
        with pytest.raises(_InjectedCrash):
            pipelines.curate_corpus(docs).curated.count()
    finally:
        pipelines.ngram_dedup_clusters = real_cc

    retry = canonical_rows(pipelines.curate_corpus(docs).curated.toPandas())
    assert retry == reference
