"""Streaming catalog entries (SURVEY §2.10 #56–#62).

A bounded ``Trigger.AvailableNow`` drain over the driver's single-file events
table is DETERMINISTIC: one micro-batch processes every row (no mid-stream
late drops), the final watermark lands at ``max(ts) - delay``, and append-mode
stateful operators then emit exactly the windows/sessions that watermark
closed. That makes the drained result SQL-expressible, so these keys carry
real DuckDB oracles — the emission rule (``win.end <= max(ts) - delay``,
pinned by tests/test_streaming.py's batch-twin properties) appears in each
oracle as a ``wm`` CTE. Float sums go through the fixed-point ``dsum``
accumulator (functions/parity.py) so the stateful partial-merge order cannot
perturb low bits.

Since round 5 every streaming key carries a SQL oracle:
``q_stream_source_sync`` drains the custom sync-token DataSource over a
committed NDJSON fixture, which DuckDB reads directly via ``read_json``
(the q_ingest_json pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import register
from .functions.parity import sql_dsum
from .streaming import jobs

#: The final-watermark CTE shared by every append-mode oracle: AvailableNow
#: over one file = one micro-batch, after which the watermark is
#: max(event time) - delay and a closing batch flushes the state store.
_WM = "SELECT max(CAST(ts AS TIMESTAMP)) - INTERVAL 10 MINUTES AS w FROM events"


@register(
    "q_stream_tumbling",
    oracle=f"""
    WITH wm AS ({_WM})
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    HAVING date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR
           <= (SELECT w FROM wm)
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#56–#58 file stream → watermark → stateful windowed agg → memory.

    Append mode emits exactly the tumbling windows the final watermark
    closed; the oracle is the batch rollup filtered to those windows."""
    return jobs.tumbling_counts_stream(spark, sf_dir)


@register(
    "q_stream_sliding",
    oracle=f"""
    WITH ev AS (
        SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 1800) AS BIGINT) AS slot
        FROM events
    ),
    wm AS (SELECT max(ts) - INTERVAL 10 MINUTES AS w FROM ev),
    expanded AS (
        -- 2 h window / 30 min slide: each event lands in window/slide = 4
        -- epoch-aligned windows (Spark aligns starts to slide multiples).
        SELECT make_timestamp((slot - off.i) * 1800 * 1000000) AS bucket,
               event_type, value
        FROM ev CROSS JOIN (VALUES (0), (1), (2), (3)) AS off(i)
    )
    SELECT bucket, event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM expanded
    GROUP BY 1, 2
    HAVING bucket + INTERVAL 2 HOURS <= (SELECT w FROM wm)
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2 h / 30 min windowed agg — overlap-factor-bounded state."""
    return jobs.sliding_counts_stream(spark, sf_dir)


@register(
    "q_stream_dedup",
    oracle="""
    -- dropDuplicatesWithinWatermark keeps the first arrival per event_id;
    -- the corpus has no duplicate event_ids (recon: 0 at every sf), so the
    -- drained stream is exactly the projection. Were duplicates present the
    -- survivor's payload would be arrival-order-dependent and this key
    -- would have to drop back to rows-only.
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
    FROM events
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#59 dropDuplicatesWithinWatermark across micro-batches."""
    return jobs.dedup_stream(spark, sf_dir)


@register(
    "q_stream_static_join",
    oracle=f"""
    WITH wm AS ({_WM}),
    cat AS (
        SELECT * FROM (VALUES
            ('click', 'engagement'), ('view', 'engagement'),
            ('signup', 'conversion'), ('purchase', 'conversion'),
            ('error', 'ops')) AS t(event_type, category)
    )
    SELECT make_timestamp(
               CAST(floor(epoch(CAST(e.ts AS TIMESTAMP)) / 21600) AS BIGINT)
               * 21600 * 1000000) AS bucket,
           c.category,
           COUNT(*) AS n_events
    FROM events e JOIN cat c ON e.event_type = c.event_type
    GROUP BY 1, 2
    HAVING bucket + INTERVAL 6 HOURS <= (SELECT w FROM wm)
    """,
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#60 stream ⋈ static dim enrichment with windowed rollup."""
    return jobs.stream_static_join(spark, sf_dir)


@register(
    "q_stream_session",
    oracle="""
    -- Emitted sessions = (a) every session closed WITHIN the drain by a
    -- later event (gap > 30 min ⇒ not the user's last session) plus
    -- (b) each user's last session when its event-time timeout
    -- (last event + 30 min) fell strictly before the final watermark.
    WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         <= INTERVAL 30 MINUTES
                    THEN 0 ELSE 1 END AS new_sess
        FROM ev
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sess_id
        FROM flagged
    ),
    sessions AS (
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               COUNT(*) AS n_events
        FROM numbered
        GROUP BY user_id, sess_id
    ),
    ranked AS (
        SELECT *, MAX(session_end) OVER (PARTITION BY user_id) AS user_last_end
        FROM sessions
    ),
    wm AS (SELECT max(ts) - INTERVAL 10 MINUTES AS w FROM ev)
    SELECT user_id, session_start, session_end, n_events
    FROM ranked
    WHERE session_end < user_last_end
       OR session_end + INTERVAL 30 MINUTES < (SELECT w FROM wm)
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#62 custom stateful sessionization (applyInPandasWithState), 30-min
    gap — also property-checked against batch session_window in tests."""
    return jobs.sessionize_stream(spark, sf_dir)


@register(
    "q_stream_upsert",
    oracle="""
    -- Last-modified-wins upsert keyed by user_id, tiebreak event_type DESC;
    -- the corpus has no (user_id, ts, event_type) ties at the per-user max
    -- (recon: 0 at every sf), so the survivor row is fully deterministic.
    SELECT user_id, ts, event_type, value FROM (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP) DESC, event_type DESC
               ) AS rn
        FROM events
    ) t WHERE rn = 1
    """,
)
def q_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#61 foreachBatch last-modified-wins upsert load (replay-idempotent)."""
    return jobs.foreach_batch_upsert(spark, sf_dir)


@register(
    "q_stream_stream_join",
    oracle="""
    -- Inner stream-stream joins emit every match in the batch where both
    -- sides are present; a bounded single-batch drain therefore equals the
    -- full range join (watermarks size STATE EVICTION, not emission).
    SELECT v.user_id AS user_id,
           CAST(v.ts AS TIMESTAMP) AS view_ts,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts,
           p.value AS purchase_value
    FROM events v JOIN events p ON v.user_id = p.user_id
    WHERE v.event_type = 'view' AND p.event_type = 'purchase'
      AND CAST(v.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
      AND CAST(v.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream attribution join (views ⋈ purchases within 1 hour),
    state bounded by dual watermarks + the event-time range condition."""
    return jobs.stream_stream_join(spark, sf_dir)


@register(
    "q_stream_source_sync",
    oracle=f"""
    SELECT type, COUNT(*) AS n_stories
    FROM read_json('{jobs.STORIES_FIXTURE}', format='newline_delimited',
                    columns={{'type': 'VARCHAR'}})
    GROUP BY type
    """,
)
def q_stream_source_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python streaming DataSource: the Events-API sync-token poll
    loop as a first-class readStream format (offset dict = sync token,
    checkpointed by Spark). SQL-oracle-checked since round 5: a fully
    drained sync feed is exactly the batch aggregate of the fixture, which
    DuckDB reads via ``read_json`` (the q_ingest_json pattern, driver-proven
    in r02) — the fixture is committed, so the oracle never races the
    engine's lazy fixture generation."""
    return jobs.sync_token_source_stream(spark)
