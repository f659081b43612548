"""Event-time window plans over the `events` table.

The reference has no streaming (SURVEY §2.9 — its incremental behavior
is a polling batch loop), so these are the extended surface: tumbling /
sliding window aggregations and sessionization, written batch-first
with `F.window`. The same expressions run under Structured Streaming —
see `compendium_spark.streaming.windows` for the readStream form with
watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from compendium_spark.functions.numeric import quantize6
from compendium_spark.plans.registry import plan
from compendium_spark.tables import load

DEC = "decimal(18,4)"

TUMBLING_SQL = """
SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""


@plan("w1_tumbling_window", oracle=TUMBLING_SQL)
def w1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window counts+sums per event type.

    `F.window` buckets are epoch-aligned, matching DuckDB's
    time_bucket under UTC. Streaming-ready: add a watermark and this
    exact expression runs incrementally.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


SLIDING_SQL = """
SELECT window_start, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM (
  SELECT time_bucket(INTERVAL '5 minutes', ts) - CAST(k.k * 5 AS INT) * INTERVAL '1 minute'
           AS window_start,
         value
  FROM events, (SELECT unnest(range(2)) AS k) k
)
GROUP BY window_start
ORDER BY window_start
"""


@plan("w2_sliding_window", oracle=SLIDING_SQL)
def w2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes (each event lands in
    exactly 2 windows). Oracle reproduces Spark's assignment by
    enumerating slide offsets."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes

SESSION_SQL = f"""
WITH o AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_us
  FROM events
),
m AS (
  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS is_new
  FROM o
),
s AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
  FROM m
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us
FROM s
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


@plan("w3_sessionization", oracle=SESSION_SQL)
def w3_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute inactivity gap splits a user's events
    into sessions (lag + cumulative-sum-of-boundaries pattern).

    Timestamps compared in integer microseconds (unix_micros /
    epoch_us) — exact in both engines. In streaming this becomes
    `session_window(ts, '30 minutes')`.
    """
    ev = load(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = order.rowsBetween(Window.unboundedPreceding, 0)
    us = F.unix_micros(F.col("ts"))
    with_gap = ev.select("user_id", "event_id", "ts", us.alias("us")).withColumn(
        "prev_us", F.lag("us").over(order)
    )
    with_sess = with_gap.withColumn(
        "is_new",
        F.when(
            F.col("prev_us").isNull()
            | ((F.col("us") - F.col("prev_us")) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    ).withColumn("session_id", F.sum("is_new").over(run))
    return (
        with_sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            (F.max("us") - F.min("us")).alias("duration_us"),
        )
        .orderBy("user_id", "session_id")
    )


FUNNEL_SQL = """
WITH u AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS st
  FROM events GROUP BY user_id
),
v AS (
  SELECT u.user_id, MIN(e.ts) AS vt
  FROM u JOIN events e
    ON e.user_id = u.user_id AND e.event_type = 'view' AND e.ts > u.st
  GROUP BY u.user_id
),
c AS (
  SELECT v.user_id, MIN(e.ts) AS ct
  FROM v JOIN events e
    ON e.user_id = v.user_id AND e.event_type = 'click' AND e.ts > v.vt
  GROUP BY v.user_id
),
p AS (
  SELECT c.user_id, MIN(e.ts) AS pt
  FROM c JOIN events e
    ON e.user_id = c.user_id AND e.event_type = 'purchase' AND e.ts > c.ct
  GROUP BY c.user_id
)
SELECT (SELECT COUNT(st) FROM u) AS n_signup,
       (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_click,
       (SELECT COUNT(*) FROM p) AS n_purchase
"""


@plan("w10_funnel_conversion", oracle=FUNNEL_SQL)
def w10_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (signup -> view -> click -> purchase):
    how many users reach each stage, where every stage's event must be
    strictly AFTER the previous stage's first event.

    Scale shape: ONE shuffle. Each user's per-type timestamps are
    gathered in a single groupBy into sorted arrays, then the stage
    chain is resolved with array higher-order functions (filter +
    element_at) — no per-stage self-join of the 100 TB event table,
    which is what the equivalent SQL (see oracle) would do. State per
    user is O(events of that user), the same as any sessionization.
    The oracle expresses the identical semantics as a per-stage
    min-join chain, which DuckDB can run on test-scale data.
    """
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("st"),
        F.array_sort(
            F.collect_list(F.when(F.col("event_type") == "view", F.col("ts")))
        ).alias("views"),
        F.array_sort(
            F.collect_list(F.when(F.col("event_type") == "click", F.col("ts")))
        ).alias("clicks"),
        F.array_sort(
            F.collect_list(F.when(F.col("event_type") == "purchase", F.col("ts")))
        ).alias("purchases"),
    )
    # try_element_at, not element_at: a user missing a stage has an
    # EMPTY filtered array, and under ANSI mode (Spark 4 default)
    # element_at(empty, 1) THROWS instead of returning null — a latent
    # crash on any corpus where some user lacks an event type
    # (tests/test_funnel.py pins this case)
    staged = (
        per_user.withColumn(
            "vt",
            F.try_element_at(F.filter("views", lambda x: x > F.col("st")), F.lit(1)),
        )
        .withColumn(
            "ct",
            F.try_element_at(F.filter("clicks", lambda x: x > F.col("vt")), F.lit(1)),
        )
        .withColumn(
            "pt",
            F.try_element_at(
                F.filter("purchases", lambda x: x > F.col("ct")), F.lit(1)
            ),
        )
    )
    return staged.agg(
        F.count("st").alias("n_signup"),
        F.count("vt").alias("n_view"),
        F.count("ct").alias("n_click"),
        F.count("pt").alias("n_purchase"),
    )


# Event types map to unique initials (click/error/purchase/signup/view
# → C/E/P/S/V), so a user's ordered history becomes a string and
# sequence patterns become regexes. Both engines' regex dialects agree
# on these patterns (greedy, non-overlapping leftmost scan; no
# backrefs/lookaround, which RE2 lacks).
_SEQ_PATTERN_BURST = "E{2,}"          # runs of consecutive errors
_SEQ_PATTERN_FUNNEL = "S.*V.*C.*P"    # signup..view..click..purchase

SEQ_PATTERN_SQL = f"""
WITH seqs AS (
  SELECT user_id,
         string_agg(upper(substr(event_type, 1, 1)), ''
                    ORDER BY ts, event_id) AS seq
  FROM events
  GROUP BY user_id
)
SELECT user_id,
       length(seq) AS seq_len,
       len(regexp_extract_all(seq, '{_SEQ_PATTERN_BURST}')) AS n_error_bursts,
       regexp_matches(seq, '{_SEQ_PATTERN_FUNNEL}') AS has_funnel
FROM seqs
ORDER BY user_id
"""


@plan("w11_sequence_pattern", oracle=SEQ_PATTERN_SQL)
def w11_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence detection: events → per-user
    ordered symbol string → regex.

    The classic distributed substitute for SQL's MATCH_RECOGNIZE (which
    Spark lacks): one shuffle groups each user's events, array_sort
    orders them by (ts, event_id) WITHIN the aggregation (no global
    sort, no window), and pattern matching is scan-stage regex on the
    compacted string. At 100 TB the per-user string is bounded by
    per-user event count — for heavy users, sessionize first
    (w3_sessionization) and match per session; the shuffle carries one
    symbol char per event either way, never the event payload.
    Detects: error bursts (`E{{2,}}`) and the full signup→purchase
    funnel (`S.*V.*C.*P`) — the ordered-regex twin of
    w10_funnel_conversion's timestamp-based form.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.struct(
            F.col("ts"),
            F.col("event_id"),
            F.upper(F.substring("event_type", 1, 1)).alias("ch"),
        ).alias("s"),
    )
    seqs = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("s")), lambda x: x["ch"]
            ),
            "",
        ).alias("seq")
    )
    return seqs.select(
        "user_id",
        F.length("seq").alias("seq_len"),
        F.size(
            F.regexp_extract_all(F.col("seq"), F.lit(_SEQ_PATTERN_BURST), F.lit(0))
        ).alias("n_error_bursts"),
        F.col("seq").rlike(_SEQ_PATTERN_FUNNEL).alias("has_funnel"),
    ).orderBy("user_id")


# max allowed gap between consecutive funnel stages (time-bounded
# conversion attribution window)
FUNNEL_GAP_HOURS = 72

W12_SQL = f"""
WITH u AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS st
  FROM events GROUP BY user_id
),
v AS (
  SELECT u.user_id, MIN(e.ts) AS vt
  FROM u JOIN events e
    ON e.user_id = u.user_id AND e.event_type = 'view'
   AND e.ts > u.st AND e.ts <= u.st + INTERVAL {FUNNEL_GAP_HOURS} HOUR
  GROUP BY u.user_id
),
c AS (
  SELECT v.user_id, MIN(e.ts) AS ct
  FROM v JOIN events e
    ON e.user_id = v.user_id AND e.event_type = 'click'
   AND e.ts > v.vt AND e.ts <= v.vt + INTERVAL {FUNNEL_GAP_HOURS} HOUR
  GROUP BY v.user_id
),
p AS (
  SELECT c.user_id, MIN(e.ts) AS pt
  FROM c JOIN events e
    ON e.user_id = c.user_id AND e.event_type = 'purchase'
   AND e.ts > c.ct AND e.ts <= c.ct + INTERVAL {FUNNEL_GAP_HOURS} HOUR
  GROUP BY c.user_id
)
SELECT (SELECT COUNT(st) FROM u) AS n_signup,
       (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_click,
       (SELECT COUNT(*) FROM p) AS n_purchase
"""


@plan("w12_time_bounded_funnel", oracle=W12_SQL)
def w12_time_bounded_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel with an attribution window: each stage must
    land within {FUNNEL_GAP_HOURS} h of the previous stage's event —
    the form real funnel analytics uses (an unbounded funnel credits a
    purchase months after the click).

    Identical ONE-shuffle shape to `w10_funnel_conversion` (per-user
    sorted timestamp arrays from a single groupBy, stage chain
    resolved with array filter + try_element_at), with the gap bound
    added to each filter predicate — the self-join chain the oracle
    runs never touches the Spark side. Timestamp arithmetic is integer
    microseconds on both engines.
    """
    gap = F.expr(f"INTERVAL {FUNNEL_GAP_HOURS} HOURS")
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("st"),
        F.array_sort(
            F.collect_list(F.when(F.col("event_type") == "view", F.col("ts")))
        ).alias("views"),
        F.array_sort(
            F.collect_list(F.when(F.col("event_type") == "click", F.col("ts")))
        ).alias("clicks"),
        F.array_sort(
            F.collect_list(F.when(F.col("event_type") == "purchase", F.col("ts")))
        ).alias("purchases"),
    )
    staged = (
        per_user.withColumn(
            "vt",
            F.try_element_at(
                F.filter(
                    "views",
                    lambda x: (x > F.col("st")) & (x <= F.col("st") + gap),
                ),
                F.lit(1),
            ),
        )
        .withColumn(
            "ct",
            F.try_element_at(
                F.filter(
                    "clicks",
                    lambda x: (x > F.col("vt")) & (x <= F.col("vt") + gap),
                ),
                F.lit(1),
            ),
        )
        .withColumn(
            "pt",
            F.try_element_at(
                F.filter(
                    "purchases",
                    lambda x: (x > F.col("ct")) & (x <= F.col("ct") + gap),
                ),
                F.lit(1),
            ),
        )
    )
    return staged.agg(
        F.count("st").alias("n_signup"),
        F.count("vt").alias("n_view"),
        F.count("ct").alias("n_click"),
        F.count("pt").alias("n_purchase"),
    )


# ---------------------------------------------------------------------------
# w16: running distinct count (first-seen flag + cumulative sum)
# ---------------------------------------------------------------------------

RUNNING_DISTINCT_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN ROW_NUMBER() OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events
)
SELECT user_id, event_id,
       CAST(SUM(first_seen) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS distinct_types_so_far
FROM flagged
ORDER BY user_id, event_id
"""


@plan("w16_running_distinct", oracle=RUNNING_DISTINCT_SQL)
def w16_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) per key — a window no engine supports
    directly (DISTINCT aggregates are invalid in running frames), via
    the standard two-window decomposition: flag each (user, type)'s
    FIRST occurrence with a per-(user, type) row_number, then a plain
    running SUM of the flags over the user's timeline.

    Parity: two integer window passes, zero floats.

    Scale: both windows hash-partition by user_id (the second reuses
    the first's shuffle modulo the composite key — one extra sort, no
    extra network pass at the same key grain); per-row state is one
    integer. The naive alternative — COUNT(DISTINCT) per prefix —
    is quadratic; this is O(n log n) in the partition sort.
    """
    ev = load(spark, sf_dir, "events")
    wfirst = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.row_number().over(wfirst) == 1, F.lit(1))
        .otherwise(F.lit(0))
        .alias("first_seen"),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("first_seen").over(wrun).alias("distinct_types_so_far"),
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# w17: cohort retention matrix
# ---------------------------------------------------------------------------

RETENTION_SQL = """
WITH weekly AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) / 7.0)
              AS BIGINT) AS week
  FROM events
),
cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM weekly GROUP BY user_id)
SELECT c.cohort_week,
       w.week - c.cohort_week AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM weekly w JOIN cohort c ON w.user_id = c.user_id
GROUP BY c.cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


@plan("w17_retention_cohorts", oracle=RETENTION_SQL)
def w17_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active week,
    counted at each week offset they return — THE product-analytics
    triangle every activity warehouse serves, and a useful corpus
    lens too (source first-seen vs continued contribution). All
    integer arithmetic (epoch-week numbers), so parity is exact.

    Scale: the distinct (user, week) presence frame is computed ONCE
    (lazy checkpoint — it feeds both the cohort min-aggregate and the
    join side, and without the checkpoint the event scan + distinct
    ran twice); the cohort side broadcasts; the final matrix
    aggregate is cohort_week × offset sized. Event volume never
    reaches the join — only the distinct weekly-presence rows do."""
    ev = load(spark, sf_dir, "events")
    weekly = (
        ev.select(
            "user_id",
            F.floor(
                F.datediff(F.to_date("ts"), F.lit("1970-01-01")) / 7.0
            )
            .cast("long")
            .alias("week"),
        )
        .distinct()
        # referenced by both the cohort aggregate and the join side —
        # lazy checkpoint so the event scan + distinct run once
        .localCheckpoint(eager=False)
    )
    cohort = weekly.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weekly.join(cohort, "user_id")
        .groupBy(
            "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# w18_markov_transitions — event-type transition matrix
# ---------------------------------------------------------------------------

MARKOV_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
),
pairs AS (
  SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n
  FROM seq WHERE prev IS NOT NULL
  GROUP BY prev, event_type
),
tot AS (
  SELECT from_type, CAST(SUM(n) AS BIGINT) AS t FROM pairs GROUP BY from_type
)
SELECT p.from_type, p.to_type,
       CAST(p.n AS BIGINT) AS n,
       CAST(FLOOR(CAST(1.0 * p.n / t.t AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) / 1000000.0 AS prob
FROM pairs p JOIN tot t USING (from_type)
ORDER BY from_type, to_type
"""


@plan("w18_markov_transitions", oracle=MARKOV_SQL)
def w18_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (round-7 addition): P(next event type | current), the
    behavioral-sequence statistic that feeds session simulation,
    anomaly scoring, and next-action models. Order within a user is
    (ts, event_id) — the unique ingestion sequence, so LAG is
    deterministic.

    Shape: one keyed window (partitioned by user — parallel, no
    global sort), then a tiny (type × type) aggregate; the row
    probability divides exact BIGINT counts, float enters once.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    pairs = (
        seq.groupBy(
            F.col("prev").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pairs.groupBy("from_type").agg(F.sum("n").cast("long").alias("t"))
    return (
        pairs.join(tot, "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n").cast("long").alias("n"),
            quantize6(F.lit(1.0) * F.col("n") / F.col("t")).alias("prob"),
        )
        .orderBy("from_type", "to_type")
    )
