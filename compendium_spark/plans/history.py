"""Temporal history operators: slowly-changing-dimension interval
builds and gaps-and-islands streak detection.

Both are canonical warehouse patterns the reference's relational
surface implies but never needs (its tables are append-only metadata,
reference db.py:89-186): SCD Type-2 is how a 100 TB pipeline persists
dimension history (every attribute change opens a validity interval),
and gaps-and-islands is the window-function idiom behind streak /
continuity analysis (consecutive active days, sensor uptime runs).

Parity: both plans are pure window-function pipelines over integers,
dates and timestamps — no floats anywhere — so the engines agree
bit-for-bit with no quantization step at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from compendium_spark.functions.numeric import quantize6
from compendium_spark.plans.registry import plan
from compendium_spark.tables import load

# ---------------------------------------------------------------------------
# j16: SCD Type-2 dimension build from an event stream
# ---------------------------------------------------------------------------

SCD2_SQL = """
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
)
SELECT user_id,
       CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version,
       status,
       valid_from,
       LEAD(valid_from) OVER w2 AS valid_to,
       LEAD(valid_from) OVER w2 IS NULL AS is_current
FROM changes
-- event_id tie-break: two changes CAN share a timestamp (distinct
-- events, equal ts); ordering by valid_from alone would leave the
-- version sequence engine-dependent
WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from, event_id)
ORDER BY user_id, version
"""


@plan("j16_scd2_intervals", oracle=SCD2_SQL)
def j16_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build: collapse an event stream into
    versioned validity intervals — one row per status *change*, with
    half-open [valid_from, valid_to) ranges and an is_current flag on
    the open interval.

    Shape: two window passes over the same user_id partitioning
    (change detection via LAG, interval close via LEAD), so Spark
    plans ONE shuffle — the second window reuses the first's hash
    partitioning, and the per-user sort is shared. Tie-break on
    (ts, event_id) makes the change sequence deterministic.

    Scale: the standard dimension-history shape at 100 TB — state per
    key is the window frame (one previous row), nothing is collected,
    and the output is bounded by the number of CHANGES, not events.
    Updating an existing SCD2 table from a delta batch composes this
    plan with the j6 MERGE (close open intervals, insert new ones).
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    changes = ordered.filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    ).select(
        "user_id",
        F.col("event_type").alias("status"),
        F.col("ts").alias("valid_from"),
        "event_id",
    )
    # event_id tie-break: two changes can share a timestamp; ordering
    # by valid_from alone would leave version numbering engine-dependent
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        F.row_number().over(w2).cast("long").alias("version"),
        "status",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    ).orderBy("user_id", "version")


# ---------------------------------------------------------------------------
# w13: gaps and islands — consecutive-day activity streaks
# ---------------------------------------------------------------------------

GAP_ISLANDS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
  FROM events
),
tagged AS (
  SELECT user_id, d,
         datediff('day', DATE '1970-01-01', d)
           - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS island
  FROM days
),
islands AS (
  SELECT user_id, island,
         COUNT(*) AS len,
         MIN(d) AS start_day,
         MAX(d) AS end_day
  FROM tagged
  GROUP BY user_id, island
),
ranked AS (
  SELECT user_id, len, start_day, end_day,
         COUNT(*) OVER (PARTITION BY user_id) AS n_streaks,
         CAST(SUM(len) OVER (PARTITION BY user_id) AS BIGINT) AS active_days,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY len DESC, start_day
         ) AS rk
  FROM islands
)
SELECT user_id, CAST(n_streaks AS BIGINT) AS n_streaks,
       active_days,
       len AS longest_len,
       -- TIMESTAMP, not DATE: Spark's toPandas renders DATE as python
       -- objects while DuckDB yields datetime64 — the driver's hash
       -- serializes them differently. Midnight-UTC timestamps agree.
       CAST(start_day AS TIMESTAMP) AS longest_start,
       CAST(end_day AS TIMESTAMP) AS longest_end
FROM ranked
WHERE rk = 1
ORDER BY user_id
"""


@plan("w13_gap_islands", oracle=GAP_ISLANDS_SQL)
def w13_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-day activity streaks via
    the row_number-difference trick (day_number − row_number is
    constant exactly within a run of consecutive days), then per-user
    streak stats with a deterministic longest-streak pick (longest,
    earliest-start tie-break).

    Parity: all arithmetic is integer (epoch-day difference minus row
    number) and date — no floats, no quantization needed.

    Scale: one shuffle on user_id serves the dedup, the island tag,
    the island aggregate AND the final ranking (same partitioning
    throughout); state per user is one window frame. The classic
    alternative — self-join on day±1 — is a second O(n) shuffle that
    this form avoids entirely.
    """
    ev = load(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    tagged = days.select(
        "user_id",
        "d",
        (
            F.datediff(F.col("d"), F.lit("1970-01-01"))
            - F.row_number().over(w)
        ).alias("island"),
    )
    islands = tagged.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("d").alias("start_day"),
        F.max("d").alias("end_day"),
    )
    wu = Window.partitionBy("user_id")
    wrk = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), F.col("start_day")
    )
    ranked = islands.select(
        "user_id",
        "len",
        "start_day",
        "end_day",
        F.count(F.lit(1)).over(wu).cast("long").alias("n_streaks"),
        F.sum("len").over(wu).alias("active_days"),
        F.row_number().over(wrk).alias("rk"),
    )
    return (
        ranked.filter(F.col("rk") == 1)
        .select(
            "user_id",
            "n_streaks",
            "active_days",
            F.col("len").alias("longest_len"),
            F.col("start_day").cast("timestamp").alias("longest_start"),
            F.col("end_day").cast("timestamp").alias("longest_end"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# w14: last-touch attribution
# ---------------------------------------------------------------------------

ATTRIBUTION_SQL = """
WITH carried AS (
  SELECT user_id, event_id, event_type, ts,
         LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END
                    IGNORE NULLS) OVER w AS click_id,
         LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END
                    IGNORE NULLS) OVER w AS click_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id,
       event_id AS purchase_id,
       ts AS purchase_ts,
       click_id,
       CASE WHEN click_id IS NOT NULL
            THEN datediff('microsecond', click_ts, ts) END AS lag_us
FROM carried
WHERE event_type = 'purchase'
ORDER BY user_id, purchase_id
"""


@plan("w14_attribution", oracle=ATTRIBUTION_SQL)
def w14_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the most
    recent preceding click by the same user (the marketing-analytics
    staple; first-touch is the same plan with an unbounded-following
    FIRST_VALUE). A running IGNORE-NULLS LAST_VALUE carries the click
    forward — the same one-pass idiom as ts_resample_ffill — so there
    is NO self-join between purchases and clicks.

    Parity: ids and timestamps carry exactly; the attribution lag is
    an INTEGER microsecond difference (epoch microseconds on both
    engines), no floats anywhere. The explicit ROWS frame pins the
    (ts, event_id) tie order on both engines.

    Scale: one shuffle on user_id, state per row is one carried
    (id, ts) pair. The join formulation — purchases ASOF-joined to
    clicks (j8's shape) — shuffles both sides instead; this form reads
    the stream once and is the one that survives a 100 TB event log.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_id = F.last(
        F.when(F.col("event_type") == "click", F.col("event_id")), True
    ).over(w)
    click_ts = F.last(
        F.when(F.col("event_type") == "click", F.col("ts")), True
    ).over(w)
    carried = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        click_id.alias("click_id"),
        click_ts.alias("click_ts"),
    )
    return (
        carried.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            "click_id",
            F.when(
                F.col("click_id").isNotNull(),
                F.unix_micros(F.col("ts")) - F.unix_micros(F.col("click_ts")),
            ).alias("lag_us"),
        )
        .orderBy("user_id", "purchase_id")
    )


# ---------------------------------------------------------------------------
# j17: point-in-time (temporal) join against an SCD2 dimension
# ---------------------------------------------------------------------------

PIT_SQL = """
WITH touches AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER w AS prev_type
  FROM events
  WHERE event_type IN ('click', 'view')
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
dim AS (
  SELECT user_id, event_type AS touch_state, ts AS valid_from,
         CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version,
         LEAD(ts) OVER w2 AS valid_to
  FROM touches
  WHERE prev_type IS NULL OR prev_type <> event_type
  -- event_id tie-break, same reason as j16: same-ts changes must get
  -- a deterministic version order on both engines
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
),
facts AS (
  SELECT user_id, event_id AS purchase_id, ts
  FROM events WHERE event_type = 'purchase'
)
SELECT f.user_id, f.purchase_id, f.ts,
       d.touch_state, d.version
FROM facts f
LEFT JOIN dim d
  ON f.user_id = d.user_id
 AND f.ts >= d.valid_from
 AND (d.valid_to IS NULL OR f.ts < d.valid_to)
ORDER BY f.user_id, f.purchase_id
"""


@plan("j17_point_in_time_join", oracle=PIT_SQL)
def j17_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each fact row (purchase) picks up the
    dimension version (marketing-touch state, SCD2 intervals built
    from click/view changes) that was valid AT the fact's timestamp —
    the feature-store primitive that prevents training-label leakage
    (a fact must never see a dimension row from its future).

    The oracle states the semantics as the declarative interval join;
    the Spark plan uses the UNION-SORT MERGE form instead: tag
    dimension-change rows and fact rows into one stream, one window
    pass per user carries the open dimension version forward, facts
    read it at their position. Sort key (ts, is_fact, version,
    purchase_id): at equal ts, dim rows come FIRST (a fact at a
    change's exact timestamp reads the NEW version — matching the
    oracle's half-open intervals) and same-ts dim rows apply in
    version order so the carry lands on the highest.

    Scale: ONE shuffle on user_id and a single ordered pass — no
    range join, no interval explosion, state per user is one carried
    (state, version) pair. The equivalent range join shuffles both
    sides AND risks interval skew; the merge form is how temporal
    joins survive a 100 TB fact table. (For a SMALL dimension the
    j10-style binned broadcast is the alternative; this form needs no
    bound on interval length.)
    """
    ev = load(spark, sf_dir, "events")
    touches = ev.filter(F.col("event_type").isin("click", "view"))
    wt = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        touches.select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            F.lag("event_type").over(wt).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = changes.select(
        "user_id",
        F.col("event_type").alias("touch_state"),
        F.col("ts"),
        F.row_number().over(w2).cast("long").alias("version"),
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    # union-sort merge: dim rows first at equal ts (is_fact = 0 < 1)
    tagged = dim.select(
        "user_id",
        "ts",
        F.lit(0).alias("is_fact"),
        F.lit(None).cast("long").alias("purchase_id"),
        "touch_state",
        "version",
    ).unionByName(
        facts.select(
            "user_id",
            "ts",
            F.lit(1).alias("is_fact"),
            "purchase_id",
            F.lit(None).cast("string").alias("touch_state"),
            F.lit(None).cast("long").alias("version"),
        )
    )
    # among same-ts dim rows the carry must read the HIGHEST version
    # last (the oracle's half-open intervals give a same-ts fact the
    # later version); facts have NULL version, ordered first among
    # peers so they read the already-carried state
    wc = (
        Window.partitionBy("user_id")
        .orderBy(
            "ts",
            "is_fact",
            F.col("version").asc_nulls_first(),
            "purchase_id",
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        "user_id",
        "ts",
        "is_fact",
        "purchase_id",
        F.last("touch_state", True).over(wc).alias("touch_state"),
        F.last("version", True).over(wc).alias("version"),
    )
    return (
        carried.filter(F.col("is_fact") == 1)
        .select("user_id", "purchase_id", "ts", "touch_state", "version")
        .orderBy("user_id", "purchase_id")
    )


# ---------------------------------------------------------------------------
# w15: rolling z-score anomaly detection (integer-exact moments)
# ---------------------------------------------------------------------------

ZSCORE_SQL = """
WITH cents AS (
  SELECT user_id, event_id, ts,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS c
  FROM events
),
framed AS (
  SELECT user_id, event_id, ts, c,
         CAST(SUM(c) OVER w AS BIGINT) AS s,
         CAST(SUM(c * c) OVER w AS BIGINT) AS s2,
         CAST(COUNT(c) OVER w AS BIGINT) AS n
  FROM cents
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id, c AS value_cents,
       CASE WHEN n >= 3 AND n * s2 > s * s THEN
         CAST(FLOOR(CAST(((c * n - s) / sqrt(CAST(n * s2 - s * s AS DOUBLE) * n / (n - 1))) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0
       END AS zscore,
       CASE WHEN n >= 3 AND n * s2 > s * s THEN
         abs((c * n - s) / sqrt(CAST(n * s2 - s * s AS DOUBLE) * n / (n - 1))) > 2.5
       END AS is_anomaly
FROM framed
ORDER BY user_id, event_id
"""


@plan("w15_rolling_zscore", oracle=ZSCORE_SQL)
def w15_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flag: each event's value against the
    TRAILING window of its user's previous 6 values (frame excludes
    the current row — no self-leakage), flagged at |z| > 2.5.

    Parity: naive rolling stddev is NOT cross-engine safe (window
    aggregation over doubles — DuckDB's segment tree and Spark's
    running fold accumulate in different orders), so the moments are
    integer-exact: values become BIGINT cents (the source is 2dp),
    the frame sums s and s2 are exact integers in ANY accumulation
    order, and z = (c·n − s) / sqrt((n·s2 − s²)·n/(n−1)) enters
    floating point through one division chain on bit-identical
    operands. Degenerate frames (n < 3 or zero variance) yield NULL.

    Scale: one shuffle on user_id, bounded 7-row frame state. The
    same integer-moment trick generalizes to any rolling moment
    statistic the monitoring layer needs.
    """
    ev = load(spark, sf_dir, "events")
    cents = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("c"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, -1)
    )
    framed = cents.select(
        "user_id",
        "event_id",
        "c",
        F.sum("c").over(w).alias("s"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("s2"),
        F.count("c").over(w).alias("n"),
    )
    n, s, s2, c = F.col("n"), F.col("s"), F.col("s2"), F.col("c")
    ok = (n >= 3) & (n * s2 > s * s)
    z = (c * n - s) / F.sqrt(
        (n * s2 - s * s).cast("double") * n / (n - F.lit(1))
    )
    return framed.select(
        "user_id",
        "event_id",
        c.alias("value_cents"),
        F.when(ok, quantize6(z)).alias("zscore"),
        F.when(ok, F.abs(z) > F.lit(2.5)).alias("is_anomaly"),
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# j18: SCD2 snapshot diff — audit of state changes between two as-of times
# ---------------------------------------------------------------------------

SNAPSHOT_DIFF_SQL = """
WITH bounds AS (
  SELECT MIN(ts) + INTERVAL 7 DAY AS snap1,
         MIN(ts) + INTERVAL 21 DAY AS snap2
  FROM events
),
ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
dim AS (
  SELECT user_id,
         CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version,
         event_type AS status,
         ts AS valid_from,
         LEAD(ts) OVER w2 AS valid_to
  FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s1 AS (
  SELECT d.user_id, d.status, d.version
  FROM dim d CROSS JOIN bounds b
  WHERE d.valid_from <= b.snap1
    AND (d.valid_to IS NULL OR d.valid_to > b.snap1)
),
s2 AS (
  SELECT d.user_id, d.status, d.version
  FROM dim d CROSS JOIN bounds b
  WHERE d.valid_from <= b.snap2
    AND (d.valid_to IS NULL OR d.valid_to > b.snap2)
)
SELECT COALESCE(s1.user_id, s2.user_id) AS user_id,
       s1.status AS status_t1,
       s2.status AS status_t2,
       s1.version AS version_t1,
       s2.version AS version_t2,
       COALESCE(s2.version, 0) - COALESCE(s1.version, 0) AS n_changes,
       CASE WHEN s1.user_id IS NULL THEN 'added'
            ELSE 'changed' END AS change_kind
FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
WHERE s1.user_id IS NULL OR s2.user_id IS NULL
   OR s1.status <> s2.status OR s1.version <> s2.version
ORDER BY user_id
"""


@plan("j18_snapshot_diff", oracle=SNAPSHOT_DIFF_SQL)
def j18_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 snapshot diff: which users' dimension state differs
    between two as-of times (day 7 vs day 21 of the stream) and how
    many versions elapsed — the audit/reconciliation shape behind
    "what changed since the last training snapshot". Snapshot times
    are derived from MIN(ts) so the plan tracks whatever time range
    the driver regenerates.

    Shape: ONE interval build (the j16 window pipeline), two filters
    over it (an as-of snapshot is interval containment — no second
    scan of the events), a user-keyed full outer join of two
    user-unique sides, and a 1-row bounds broadcast. All timestamps
    and integers; no quantization.

    Scale: the diff joins two snapshot-sized sides (≤ one row per
    user), never the event stream; at 100 TB the interval build is
    the only pass over the data and is shared by both snapshots.
    """
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        (F.min("ts") + F.expr("INTERVAL 7 DAYS")).alias("snap1"),
        (F.min("ts") + F.expr("INTERVAL 21 DAYS")).alias("snap2"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = changes.select(
        "user_id",
        F.row_number().over(w2).cast("long").alias("version"),
        F.col("event_type").alias("status"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    ).crossJoin(F.broadcast(bounds))

    def snapshot(col: str) -> DataFrame:
        return dim.filter(
            (F.col("valid_from") <= F.col(col))
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col(col)))
        ).select("user_id", "status", "version")

    s1 = snapshot("snap1").select(
        F.col("user_id").alias("u1"),
        F.col("status").alias("status_t1"),
        F.col("version").alias("version_t1"),
    )
    s2 = snapshot("snap2").select(
        F.col("user_id").alias("u2"),
        F.col("status").alias("status_t2"),
        F.col("version").alias("version_t2"),
    )
    j = s1.join(s2, s1["u1"] == s2["u2"], "full_outer")
    return (
        j.filter(
            F.col("u1").isNull()
            | F.col("u2").isNull()
            | (F.col("status_t1") != F.col("status_t2"))
            | (F.col("version_t1") != F.col("version_t2"))
        )
        .select(
            F.coalesce(F.col("u1"), F.col("u2")).alias("user_id"),
            "status_t1",
            "status_t2",
            "version_t1",
            "version_t2",
            (
                F.coalesce(F.col("version_t2"), F.lit(0))
                - F.coalesce(F.col("version_t1"), F.lit(0))
            ).alias("n_changes"),
            F.when(F.col("u1").isNull(), F.lit("added"))
            .otherwise(F.lit("changed"))
            .alias("change_kind"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# j20: nearest-event as-of join (bidirectional)
# ---------------------------------------------------------------------------

ASOF_TAU_S = 3600  # max |Δt| for a match, seconds

ASOF_NEAREST_SQL = f"""
WITH tagged AS (
  SELECT user_id, ts, 0 AS is_fact, event_id,
         event_id AS click_id, ts AS click_ts,
         CAST(NULL AS BIGINT) AS purchase_id
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, 1 AS is_fact, event_id,
         CAST(NULL AS BIGINT) AS click_id,
         CAST(NULL AS TIMESTAMP) AS click_ts,
         event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
),
back AS (
  SELECT *,
         LAST_VALUE(click_id IGNORE NULLS) OVER wb AS b_id,
         LAST_VALUE(click_ts IGNORE NULLS) OVER wb AS b_ts
  FROM tagged
  WINDOW wb AS (PARTITION BY user_id ORDER BY ts, is_fact, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
bidir AS (
  SELECT *,
         LAST_VALUE(click_id IGNORE NULLS) OVER wf AS f_id,
         LAST_VALUE(click_ts IGNORE NULLS) OVER wf AS f_ts
  FROM back
  WINDOW wf AS (PARTITION BY user_id
                ORDER BY ts DESC, is_fact ASC, event_id DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
picked AS (
  SELECT user_id, purchase_id, ts,
         CASE
           WHEN b_id IS NOT NULL AND (f_id IS NULL OR
                epoch_us(ts) - epoch_us(b_ts)
                  <= epoch_us(f_ts) - epoch_us(ts))
             THEN b_id ELSE f_id END AS click_id,
         CASE
           WHEN b_id IS NOT NULL AND (f_id IS NULL OR
                epoch_us(ts) - epoch_us(b_ts)
                  <= epoch_us(f_ts) - epoch_us(ts))
             THEN epoch_us(ts) - epoch_us(b_ts)
             ELSE epoch_us(f_ts) - epoch_us(ts) END AS delta_us
  FROM bidir WHERE is_fact = 1
)
SELECT user_id, purchase_id, ts,
       CASE WHEN delta_us <= CAST({ASOF_TAU_S} AS BIGINT) * 1000000
            THEN click_id ELSE NULL END AS click_id,
       CASE WHEN delta_us <= CAST({ASOF_TAU_S} AS BIGINT) * 1000000
            THEN delta_us ELSE NULL END AS delta_us
FROM picked
ORDER BY user_id, purchase_id
"""


@plan("j20_asof_nearest", oracle=ASOF_NEAREST_SQL)
def j20_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional nearest-event as-of join: every purchase picks up
    the click with the smallest |Δt| within {ASOF_TAU_S} s — the
    sensor-alignment / feature-attach primitive where "most recent"
    (j17's backward-only PIT) is the wrong semantic and you want the
    temporally CLOSEST record, past or future.

    Same union-sort-merge engine as j17 run twice: one ascending pass
    carries the latest click backward-in-time candidate, one
    descending pass carries the earliest forward candidate (clicks
    order before facts at equal ts in both passes, so a same-ts click
    matches at Δ=0), then one expression picks the nearer side
    (backward wins ties). Both engines run the IDENTICAL window logic,
    so tie-resolution can never diverge.

    Scale: one shuffle on user_id serves both window passes (same
    partitioning, opposite sort — Spark re-sorts within partitions
    without reshuffling); no range join, no candidate explosion, Δ
    math in exact integer microseconds."""
    # ONE scan: the oracle states the stream as a UNION ALL of two
    # filtered reads, but a conditional projection over a single
    # IN-filtered scan produces the identical rows (PLANS_AUDIT showed
    # the union form scanning events twice)
    ev = load(spark, sf_dir, "events")
    is_click = F.col("event_type") == "click"
    tagged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        F.when(is_click, F.lit(0)).otherwise(F.lit(1)).alias("is_fact"),
        "event_id",
        F.when(is_click, F.col("event_id")).alias("click_id"),
        F.when(is_click, F.col("ts")).alias("click_ts"),
        F.when(~is_click, F.col("event_id")).alias("purchase_id"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_fact", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("is_fact").asc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    both = (
        tagged.withColumn("b_id", F.last("click_id", True).over(wb))
        .withColumn("b_ts", F.last("click_ts", True).over(wb))
        .withColumn("f_id", F.last("click_id", True).over(wf))
        .withColumn("f_ts", F.last("click_ts", True).over(wf))
        .filter(F.col("is_fact") == 1)
    )
    b_delta = F.unix_micros("ts") - F.unix_micros("b_ts")
    f_delta = F.unix_micros("f_ts") - F.unix_micros("ts")
    take_back = F.col("b_id").isNotNull() & (
        F.col("f_id").isNull() | (b_delta <= f_delta)
    )
    picked = both.select(
        "user_id",
        "purchase_id",
        "ts",
        F.when(take_back, F.col("b_id")).otherwise(F.col("f_id")).alias(
            "click_id"
        ),
        F.when(take_back, b_delta).otherwise(f_delta).alias("delta_us"),
    )
    in_tau = F.col("delta_us") <= ASOF_TAU_S * 1_000_000
    return picked.select(
        "user_id",
        "purchase_id",
        "ts",
        F.when(in_tau, F.col("click_id")).alias("click_id"),
        F.when(in_tau, F.col("delta_us")).alias("delta_us"),
    ).orderBy("user_id", "purchase_id")


# ---------------------------------------------------------------------------
# j21: CDC change-feed apply
# ---------------------------------------------------------------------------

CDC_APPLY_SQL = """
WITH feed AS (
  SELECT user_id AS entity_id, ts, event_id, value,
         CASE event_type WHEN 'signup' THEN 'I'
                         WHEN 'error'  THEN 'D'
                         ELSE 'U' END AS op
  FROM events
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY entity_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY entity_id) AS BIGINT) AS n_ops
  FROM feed
)
SELECT entity_id,
       CAST(FLOOR(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         / 1000000.0 AS state_value,
       n_ops, ts AS last_ts
FROM ranked
WHERE rn = 1 AND op <> 'D'
ORDER BY entity_id
"""


@plan("j21_cdc_apply", oracle=CDC_APPLY_SQL)
def j21_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture apply: collapse an ordered I/U/D change
    feed (synthesized from events: signup=insert, error=delete, the
    rest=update) into the current snapshot — last writer wins per
    entity, entities whose final op is a delete disappear. The batch
    core of every CDC sink (Debezium-style feeds, Delta/Hudi MERGE):
    equivalent to a MERGE but computed as ONE window pass instead of a
    join against the target.

    Scale: one shuffle on entity_id; row_number + count ride the same
    window partitioning. At 100 TB the same plan applies a feed
    partition-parallel, and because only rn=1 survives, the output
    never exceeds the entity count."""
    feed = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("entity_id"),
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "signup", F.lit("I"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    w = Window.partitionBy("entity_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wc = Window.partitionBy("entity_id")
    return (
        feed.withColumn("rn", F.row_number().over(w))
        .withColumn("n_ops", F.count(F.lit(1)).over(wc).cast("long"))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "entity_id",
            quantize6(F.col("value").cast("double")).alias("state_value"),
            "n_ops",
            F.col("ts").alias("last_ts"),
        )
        .orderBy("entity_id")
    )
