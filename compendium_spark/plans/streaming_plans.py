"""Structured Streaming operators registered as oracle-checked plans.

The streaming forms in compendium_spark/streaming/windows.py drain a
bounded file-source stream synchronously (one AvailableNow-style pass
over the testdata events), so their results are deterministic — which
means they don't have to settle for rows-only checks: each plan here
reuses the event-time semantics of its batch twin as a DuckDB oracle
and is VALUE-hash-checked like any batch plan. The reference has no
streaming at all (SURVEY §2.9 — its incremental loop is SLURM re-runs);
this is the engine's incremental-execution surface.

Scale notes: every plan's state is watermark-bounded (windows, join
buffers, dedup id-sets); swapping the file source for Kafka changes
config, not plan shape. The memory sink is the test/gate harness —
production writes parquet/Delta via writeStream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from compendium_spark.plans.registry import plan
from compendium_spark.streaming import windows as sw

# Spark's F.window aligns to the epoch; DuckDB time_bucket's default
# origin (2000-01-01) is itself epoch-aligned for these bucket widths,
# so the two produce identical window starts.

STREAM_TUMBLING_SQL = """
SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS window_start,
       event_type,
       COUNT(*) AS n_events
FROM events
GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""


@plan("streaming_tumbling_counts", oracle=STREAM_TUMBLING_SQL)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w1's tumbling aggregation run INCREMENTALLY: watermarked
    event-time windows, per-(window, type) state, drained to a memory
    sink. The oracle proves stream ≡ batch at value level."""
    return sw.streaming_tumbling_counts(spark, sf_dir).orderBy(
        "window_start", "event_type"
    )


STREAM_SLIDING_SQL = """
SELECT window_start, COUNT(*) AS n_events
FROM (
  SELECT unnest([time_bucket(INTERVAL 5 MINUTE, ts),
                 time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE])
           AS window_start
  FROM events
)
GROUP BY window_start
ORDER BY window_start
"""


@plan("streaming_sliding_counts", oracle=STREAM_SLIDING_SQL)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w2's sliding windows (10 min every 5 min) streaming: each event
    lands in exactly two overlapping windows — the oracle materializes
    both window starts per event and re-aggregates."""
    return sw.streaming_sliding_counts(spark, sf_dir).orderBy("window_start")


STREAM_INTERVAL_JOIN_SQL = f"""
SELECT v.event_id AS view_id, c.event_id AS click_id
FROM events v
JOIN events c
  ON v.user_id = c.user_id
 AND c.ts > v.ts
 AND c.ts <= v.ts + INTERVAL {sw.INTERVAL_JOIN_MINUTES} MINUTE
WHERE v.event_type = 'view' AND c.event_type = 'click'
ORDER BY view_id, click_id
"""


@plan("streaming_interval_join", oracle=STREAM_INTERVAL_JOIN_SQL)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with an event-time range bound —
    watermarks on both sides derive state eviction for both buffers
    (state is O(40-minute horizon), not O(stream)). Value-checked
    against the equivalent batch range join. Round 8 widened the
    match window 5 → 30 minutes (23-row gate hash instead of 3)."""
    return sw.streaming_interval_join(spark, sf_dir).orderBy(
        "view_id", "click_id"
    )


STREAM_DEDUP_SQL = """
SELECT event_id, user_id, event_type
FROM events
ORDER BY event_id
"""


@plan("streaming_dedup", oracle=STREAM_DEDUP_SQL)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once delivery repair: every event arrives twice and
    dropDuplicatesWithinWatermark keeps exactly one per event_id with a
    watermark-bounded id set — the oracle is simply the original event
    set, proving the duplicate stream collapses back to it."""
    return sw.streaming_dedup(spark, sf_dir).orderBy("event_id")


SESSION_GAP_US = 30 * 60 * 1_000_000

STREAM_SESSION_SQL = f"""
WITH o AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_us
  FROM events
),
m AS (
  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us >= {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS is_new
  FROM o
),
s AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT make_timestamp(MIN(us)) AS session_start,
       make_timestamp(MAX(us) + {SESSION_GAP_US}) AS session_end,
       user_id,
       COUNT(*) AS n_events
FROM s
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


@plan("streaming_session_windows", oracle=STREAM_SESSION_SQL)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming session windows (30-minute gap): Spark merges
    events into a session while each arrives strictly before the
    current session end (last_ts + gap, end-exclusive — hence the
    oracle's `gap >= 30min starts a new session`), and reports
    [first_ts, last_ts + gap). State per open session, evicted by the
    watermark. The oracle rebuilds the same sessions with the lag-gap
    idiom."""
    return sw.streaming_session_windows(spark, sf_dir).orderBy(
        "user_id", "session_start"
    )


STREAM_RUNNING_SQL = """
SELECT user_id,
       COUNT(*) AS events_seen,
       CAST(FLOOR(CAST((SUM(value)) AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) / 10000.0 AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@plan("streaming_running_totals", oracle=STREAM_RUNNING_SQL)
def streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running totals carried in explicit keyed state across microbatches.
    After draining the bounded stream the state equals the batch
    aggregate; totals round to 4 decimals on both sides to absorb
    float accumulation-order differences."""
    return sw.streaming_running_totals(spark, sf_dir).orderBy("user_id")


STREAM_ENRICH_SQL = """
SELECT n.n_name AS nation, e.event_type,
       COUNT(*) AS n_events,
       CAST(FLOOR(CAST((SUM(e.value)) AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) / 10000.0 AS total_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name, e.event_type
ORDER BY nation, event_type
"""


@plan("streaming_enrich_join", oracle=STREAM_ENRICH_SQL)
def streaming_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: events join the broadcast
    customer→nation dimension per microbatch (stateless on the static
    side), aggregated per (nation, type). Value-checked against the
    equivalent batch join; totals round to 4 decimals to absorb float
    accumulation order."""
    return sw.streaming_enrich_join(spark, sf_dir).orderBy(
        "nation", "event_type"
    )


STREAM_MV_SQL = """
SELECT date_trunc('hour', ts) AS hour,
       event_type,
       COUNT(*) AS n_events,
       CAST(FLOOR(CAST((SUM(value)) AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) / 10000.0 AS total_value
FROM events
GROUP BY hour, event_type
ORDER BY hour, event_type
"""


@plan("streaming_mv_refresh", oracle=STREAM_MV_SQL)
def streaming_mv_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mv_incremental_refresh's streaming face: per-microbatch partial
    aggregates ADD-merged into the maintained MV inside foreachBatch;
    after the AvailableNow drain the MV must equal the batch aggregate
    over everything — which is exactly what the oracle computes."""
    return sw.streaming_mv_refresh(spark, sf_dir).orderBy(
        "hour", "event_type"
    )


# j16's interval build, filtered to CLOSED intervals — exactly the set
# a streaming SCD2 can have emitted (open intervals stay in state)
STREAM_SCD2_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
changes AS (
  SELECT user_id, event_type AS status, ts AS valid_from, event_id
  FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
),
intervals AS (
  SELECT user_id,
         CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version,
         status,
         valid_from,
         LEAD(valid_from) OVER w2 AS valid_to
  FROM changes
  WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from, event_id)
)
SELECT user_id, version, status, valid_from, valid_to
FROM intervals
WHERE valid_to IS NOT NULL
ORDER BY user_id, version
"""


@plan("streaming_scd2", oracle=STREAM_SCD2_SQL)
def streaming_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j16's SCD Type-2 build run as a STATEFUL STREAM
    (applyInPandasWithState): per user only the open interval lives in
    state; a status change closes it and emits the closed interval —
    append-mode, emit-once, replay-safe. The oracle is the batch
    interval build restricted to closed intervals (open ones are
    unknowable mid-stream, so they correctly stay in state), proving
    stream ≡ batch at value level."""
    return sw.streaming_scd2(spark, sf_dir).orderBy("user_id", "version")


# ---------------------------------------------------------------------------
# streaming_interval_outer_join — LEFT OUTER stream-stream join
# ---------------------------------------------------------------------------

# The state-eviction case the INNER interval join never exercises:
# a left-outer stream-stream join must HOLD every unmatched view in
# state until the watermark proves no qualifying click can still
# arrive, then emit it exactly once with nulls. This is the
# correctness cliff of production stream joins (emit too early →
# phantom nulls; never advance → unbounded state). Views are capped
# at a fixed cutoff well inside every fixture's time range so the
# final no-data micro-batch can flush every unmatched view — the
# same determinism discipline as the md5 samplers.
STREAM_OUTER_JOIN_SQL = f"""
WITH views AS (
  SELECT event_id AS view_id, user_id AS a_user, ts AS a_ts
  FROM events
  WHERE event_type = 'view' AND ts < TIMESTAMP '{sw.OUTER_JOIN_CUTOFF}'
),
clicks AS (
  SELECT event_id AS click_id, user_id AS b_user, ts AS b_ts
  FROM events WHERE event_type = 'click'
)
SELECT v.view_id, v.a_user, v.a_ts, c.click_id, c.b_ts
FROM views v
LEFT JOIN clicks c
  ON v.a_user = c.b_user
 AND c.b_ts > v.a_ts
 AND c.b_ts <= v.a_ts + INTERVAL {sw.OUTER_JOIN_MINUTES} MINUTE
ORDER BY v.view_id, c.click_id
"""


@plan("streaming_interval_outer_join", oracle=STREAM_OUTER_JOIN_SQL)
def streaming_interval_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every view emits
    exactly once — joined to each qualifying click, or null-extended
    AFTER the watermark proves no click can still arrive. The
    eviction-correctness counterpart of streaming_interval_join
    (inner), value-checked against the batch LEFT JOIN oracle: a
    stream that emits unmatched rows too early or never flushes them
    cannot hash-match the batch result. Transform + watermark-stall
    guard live in streaming/windows.py
    (interval_outer_join_transform)."""
    return sw.streaming_interval_outer_join(spark, sf_dir)
