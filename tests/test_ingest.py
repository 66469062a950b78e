"""Property tests for the ingestion layer (SURVEY §2.1 #3–#8, M8).

Oracle parity for the SQL-checkable keys runs in test_parity.py; these cover
the rows-only paginated source and the invariants the oracle can't express.
"""

from __future__ import annotations

from etl_asana_spark import catalog
from etl_asana_spark.sources import asana
from etl_asana_spark.sources.fixtures import FIXTURES_DIR, N_NEW, N_TASKS, N_UPDATED
from etl_asana_spark.testing import canonical_rows

_B1 = str(FIXTURES_DIR / "tasks_batch1.ndjson")
_B2 = str(FIXTURES_DIR / "tasks_batch2.ndjson")


def test_paginated_source_equals_direct_read(spark):
    """#6: the distributed page-replay fetch reconstructs the direct scan."""
    qs = catalog.queries()
    pag = qs["q_source_paginated"](spark, _B1).toPandas()
    direct = qs["q_ingest_json"](spark, _B1).toPandas()
    common = sorted(set(pag.columns) & set(direct.columns))
    assert len(pag) == N_TASKS
    assert canonical_rows(pag[common]) == canonical_rows(direct[common])


def test_upsert_key_count_and_winner(spark):
    """#8: output has one row per distinct gid; batch2 wins on overlaps."""
    b1 = asana.read_tasks(spark, _B1).select("gid", "name", "modified_at", "completed")
    b2 = asana.read_tasks(spark, _B2).select("gid", "name", "modified_at", "completed")
    merged = asana.upsert_batches(b1, b2)
    assert merged.count() == N_TASKS + N_NEW
    # every overlapping gid's surviving modified_at equals batch2's (strictly newer)
    b2_versions = {r["gid"]: r["modified_at"] for r in b2.collect()}
    for r in merged.collect():
        if r["gid"] in b2_versions:
            assert r["modified_at"] == b2_versions[r["gid"]]


def test_upsert_idempotent(spark):
    """Upserting the merged result with itself is a no-op."""
    b1 = asana.read_tasks(spark, _B1).select("gid", "name", "modified_at", "completed")
    b2 = asana.read_tasks(spark, _B2).select("gid", "name", "modified_at", "completed")
    merged = asana.upsert_batches(b1, b2)
    again = asana.upsert_batches(merged, merged)
    assert canonical_rows(again.toPandas()) == canonical_rows(merged.toPandas())


def test_incremental_returns_only_newer(spark):
    """#7: rows at-or-before the checkpoint are excluded."""
    b1 = asana.read_tasks(spark, _B1)
    ckpt = asana.max_modified(b1)
    out = asana.incremental_filter(asana.read_tasks(spark, _B2), ckpt)
    assert out.count() == N_UPDATED + N_NEW  # all batch2 rows are newer by design
    assert out.filter(f"modified_at <= '{ckpt}'").count() == 0


def test_membership_flatten_covers_all_tasks(spark):
    """#4: every task has >=1 membership bridge row; sections from the fixed set."""
    tasks = asana.read_tasks(spark, _B1)
    bridge = asana.flatten_memberships(tasks)
    assert bridge.select("task_gid").distinct().count() == N_TASKS
    names = {r["section_name"] for r in bridge.select("section_name").distinct().collect()}
    assert names <= {"Backlog", "In Progress", "Done"}


def test_rate_limited_fetcher_paces_and_matches():
    """Token bucket: after the burst, calls are paced at ~rate_per_sec; the
    fetched pages are byte-identical to the unpaced fetch."""
    import time

    limited = asana.RateLimitedFetcher(rate_per_sec=50.0, burst=2)
    start = time.monotonic()
    pages = [limited(_B1, off, 10) for off in range(0, 100, 10)]  # 10 calls
    elapsed = time.monotonic() - start
    # 10 calls, burst 2 → ≥8 paced waits at 20 ms each
    assert elapsed >= 8 / 50.0
    direct = [asana._replay_fixture_page(_B1, off, 10) for off in range(0, 100, 10)]
    assert pages == direct


def test_rate_limited_fetcher_retries_transient_errors():
    calls = {"n": 0}

    def flaky(path, offset, limit):
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("simulated 429/timeout")
        return asana._replay_fixture_page(path, offset, limit)

    limited = asana.RateLimitedFetcher(flaky, rate_per_sec=1000.0, burst=10)
    out = limited(_B1, 0, 5)
    assert len(out) == 5 and calls["n"] == 3


def test_rate_limited_fetcher_honors_retry_after():
    """HTTP 429 with Retry-After: the fetcher sleeps the SERVER's number
    (not the exponential schedule), drains the local token bucket so the
    retry re-paces from empty, and still returns the correct page."""
    import time

    sleeps = []
    calls = {"n": 0}

    def quota_wall(path, offset, limit):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise asana.RateLimitError(retry_after=0.07)
        return asana._replay_fixture_page(path, offset, limit)

    limited = asana.RateLimitedFetcher(quota_wall, rate_per_sec=1000.0, burst=10)
    real_sleep = time.sleep
    time.sleep = lambda s: (sleeps.append(s), real_sleep(min(s, 0.001)))[1]
    try:
        out = limited(_B1, 0, 5)
    finally:
        time.sleep = real_sleep
    assert len(out) == 5 and calls["n"] == 3
    # both 429s slept the server's exact Retry-After, not 0.5/1.0 backoff
    assert [s for s in sleeps if abs(s - 0.07) < 1e-9] == [0.07, 0.07]
    # the bucket drained on 429: the successful third call had to re-pace
    # (tokens were 0 before it took one), so it cannot have burst-fired
    assert limited._tokens < 1.0


def test_rate_limited_fetcher_429_without_header_backs_off():
    """429 with no Retry-After falls back to the exponential schedule and a
    persistent quota wall propagates after max_retries."""
    import time

    import pytest

    sleeps = []
    calls = {"n": 0}

    def wall_then_ok(path, offset, limit):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise asana.RateLimitError()
        return asana._replay_fixture_page(path, offset, limit)

    limited = asana.RateLimitedFetcher(wall_then_ok, rate_per_sec=1000.0, burst=10)
    real_sleep = time.sleep
    time.sleep = lambda s: (sleeps.append(s), real_sleep(min(s, 0.001)))[1]
    try:
        out = limited(_B1, 0, 5)
        with pytest.raises(asana.RateLimitError):
            asana.RateLimitedFetcher(
                lambda *a: (_ for _ in ()).throw(asana.RateLimitError(0.01)),
                rate_per_sec=1000.0, burst=10, max_retries=2,
            )(_B1, 0, 5)
    finally:
        time.sleep = real_sleep
    assert len(out) == 5
    assert 0.5 in sleeps and 1.0 in sleeps  # exponential: 0.5 then 1.0


def test_paginated_source_with_rate_limit(spark):
    """End-to-end: the paced fetcher drops into fetch_pages unchanged."""
    pages = asana.page_plan(spark, _B1, total=N_TASKS, page_size=100)
    fetched = asana.parse_fetched(
        asana.fetch_pages(pages, asana.RateLimitedFetcher(rate_per_sec=100.0))
    )
    assert fetched.count() == N_TASKS


def test_velocity_counts_each_task_once(spark):
    """A task synced in both batches must count once (upsert-then-aggregate):
    total weekly n_completed == distinct completed gids across batches."""
    out = catalog.queries()["q_golden_task_velocity"](spark, "")
    total = sum(r["n_completed"] for r in out.collect())
    merged = asana.upsert_batches(
        asana.read_tasks(spark, _B1), asana.read_tasks(spark, _B2)
    )
    expect = merged.filter("completed AND completed_at IS NOT NULL").count()
    assert total == expect > 0


def test_quarantine_gate_flags_without_dropping(spark):
    """The gate stages every row (malformed cells can't kill the job) and
    flags instead of dropping: 8 fixture rows in, 8 rows out, with exactly
    the 4 known-bad rows marked invalid for the quarantine sink."""
    df = catalog.queries()["q_ingest_quarantine"](spark, "")
    rows = {r["section_gid"]: r for r in df.collect()}
    assert len(rows) == 8  # nothing dropped (the null-gid row keys as None)
    bad = {gid for gid, r in rows.items() if not r["is_valid"]}
    # sec_102: position "two"; sec_103: bad date; None: missing gid;
    # sec_106: negative position fails the >0 rule
    assert bad == {"sec_102", "sec_103", None, "sec_106"}
    good = rows["sec_101"]
    assert good["position"] == 1 and good["created_ts"] is not None


def test_python_datasource_pages_and_pushdown(spark, sf_dir):
    """The asana_tasks DataSource must plan one partition per page (parallel
    fetch) and return exactly the rows the plain JSON read yields."""
    from etl_asana_spark import catalog
    from etl_asana_spark.queries_ingest import _B1
    from etl_asana_spark.sources import asana

    df = catalog.queries()["q_source_datasource"](spark, sf_dir)
    assert df.rdd.getNumPartitions() == 4  # 200 fixture tasks / 64 per page
    expected = (
        asana.read_tasks(spark, _B1).filter("completed = false").count()
    )
    assert df.count() == expected


def test_store_sink_replay_idempotent(spark, sf_dir):
    """Re-loading the same batch through the asana_store sink must be a
    no-op: upsert semantics make retried/replayed loads safe."""
    import tempfile

    from etl_asana_spark.queries_ingest import _B1
    from etl_asana_spark.sources import asana
    from etl_asana_spark.sources.datasource import register_asana_store

    register_asana_store(spark)
    store = tempfile.mkdtemp(prefix="asana_store_") + "/tasks.ndjson"
    cols = ["gid", "name", "modified_at", "completed"]
    df = asana.read_tasks(spark, _B1).select(*cols)
    for _ in range(2):
        df.write.format("asana_store").option("path", store).mode("append").save()
    stored = spark.read.schema(
        "gid string, name string, modified_at string, completed boolean"
    ).json(store)
    assert stored.count() == df.count()
    assert stored.exceptAll(df).isEmpty() and df.exceptAll(stored).isEmpty()


def test_store_sink_abort_leaves_store_untouched():
    """The transactional contract: a half-failed load (some tasks staged,
    then abort) must neither change the committed store nor leak staging
    files — abort deletes staged parts, the store file is never opened."""
    import os
    import tempfile
    from types import SimpleNamespace

    from etl_asana_spark.sources.datasource import AsanaStoreWriter

    store = tempfile.mkdtemp(prefix="asana_store_") + "/tasks.ndjson"
    with open(store, "w") as fh:
        fh.write('{"gid": "g1", "name": "keep", "modified_at": "2024-01-01", "completed": false}\n')
    before = open(store).read()

    writer = AsanaStoreWriter({"path": store})
    rows = [
        SimpleNamespace(asDict=lambda: {"gid": "g2", "name": "new",
                                        "modified_at": "2024-02-02",
                                        "completed": True}),
    ]
    staged = writer.write(iter(rows))  # one task staged its partition
    assert os.path.exists(staged.path)
    writer.abort([staged])  # another task failed → driver aborts
    assert not os.path.exists(staged.path)  # staging cleaned
    assert open(store).read() == before  # committed store byte-identical

    # and a later successful commit still works against the same store
    staged2 = writer.write(iter(rows))
    writer.commit([staged2])
    after = open(store).read()
    assert '"g2"' in after and '"g1"' in after


def test_http_transport_end_to_end_parity_and_backoff(spark):
    """r06 verdict item 2: the paginated REST source against a REAL local
    HTTP server (http.server), not fixture replay. The server injects one
    429 + Retry-After and one 500; the mapInPandas fetch path must honor
    the Retry-After exactly, exponentially back off the 5xx, and produce
    rows identical to the direct fixture scan."""
    import http.server
    import threading
    import time
    from urllib.parse import parse_qs, urlparse

    with open(_B1) as f:
        lines = f.read().splitlines()

    log: list[tuple[float, int, int]] = []
    lock = threading.Lock()
    fail_once = {"429": True, "500": True}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib API name)
            q = parse_qs(urlparse(self.path).query)
            offset, limit = int(q["offset"][0]), int(q["limit"][0])
            with lock:
                if offset == 0 and fail_once["429"]:
                    fail_once["429"] = False
                    log.append((time.monotonic(), offset, 429))
                    self.send_response(429)
                    self.send_header("Retry-After", "0.4")
                    self.end_headers()
                    return
                if offset == 50 and fail_once["500"]:
                    fail_once["500"] = False
                    log.append((time.monotonic(), offset, 500))
                    self.send_response(500)
                    self.end_headers()
                    return
                if offset >= len(lines):
                    log.append((time.monotonic(), offset, 404))
                    self.send_response(404)
                    self.end_headers()
                    return
                log.append((time.monotonic(), offset, 200))
            body = "\n".join(lines[offset:offset + limit]).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # silence stderr chatter
            return

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    cols = ["gid", "name", "modified_at", "completed", "num_likes"]
    try:
        pages = asana.page_plan(
            spark, "/api/1.0/tasks", total=N_TASKS, page_size=50
        )
        fetcher = asana.RateLimitedFetcher(
            asana.http_fetcher(f"http://127.0.0.1:{port}"),
            rate_per_sec=1000.0,
            burst=50,
        )
        parsed = asana.parse_fetched(asana.fetch_pages(pages, fetcher))
        got = parsed.select(*cols).toPandas()
        want = asana.read_tasks(spark, _B1).select(*cols).toPandas()
        assert canonical_rows(got) == canonical_rows(want)

        # a page past the resource ends as OSError (HTTP 404), not a hang
        import pytest

        with pytest.raises(OSError, match="404"):
            asana.http_fetcher(f"http://127.0.0.1:{port}")(
                "/api/1.0/tasks", 10_000, 50
            )
    finally:
        srv.shutdown()
        srv.server_close()

    by_offset: dict[int, list[tuple[float, int]]] = {}
    for ts, off, code in log:
        by_offset.setdefault(off, []).append((ts, code))

    # 429 honored exactly: the retry of offset 0 arrives >= Retry-After
    o0 = by_offset[0]
    assert [c for _, c in o0] == [429, 200]
    assert o0[1][0] - o0[0][0] >= 0.35

    # 5xx exponential backoff: first retry delay is 0.5 s
    o50 = by_offset[50]
    assert [c for _, c in o50] == [500, 200]
    assert o50[1][0] - o50[0][0] >= 0.45

    # exactly one successful GET per page — the page plan replays exactly
    n_ok = sum(1 for _, _, code in log if code == 200)
    assert n_ok == (N_TASKS + 49) // 50
