"""Time-series gap filling: per-key resample to a fixed grid with
forward-fill — the standard "make the series dense" step before
feature windows or charting, which none of the existing window plans
(w1-w8, sessionization) cover. No counterpart in the reference (its
time handling is pubdate bookkeeping, SURVEY §2.7 F9).

Scale: the spine explode is bounded by (active span / bucket) per key,
not by event count; observation picking and the forward-fill window
both partition by user — no global sort, no cross-key state. At 100 TB
the spine join is a co-partitioned shuffle on (user, bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from compendium_spark.plans.registry import plan
from compendium_spark.tables import load

BUCKET_US = 3_600_000_000  # 1 hour

RESAMPLE_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value,
         epoch_us(ts) // {BUCKET_US} AS b
  FROM events
),
bounds AS (SELECT user_id, MIN(b) AS b0, MAX(b) AS b1 FROM e GROUP BY user_id),
spine AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS b FROM bounds),
obs AS (
  SELECT user_id, b, value FROM (
    SELECT user_id, b, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, b
                              ORDER BY us DESC, event_id DESC) AS rn
    FROM e
  ) WHERE rn = 1
)
SELECT s.user_id,
       make_timestamp(s.b * {BUCKET_US}) AS bucket_start,
       last_value(o.value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.b
         ROWS UNBOUNDED PRECEDING
       ) AS value_ffill,
       o.value IS NOT NULL AS is_observed
FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.b = o.b
ORDER BY s.user_id, s.b
"""


@plan("ts_resample_ffill", oracle=RESAMPLE_SQL)
def ts_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's event stream onto an hourly grid and
    forward-fill the last observed value across gaps.

    Three pieces, all per-user-parallel:
      1. bounds + sequence-explode build the dense bucket spine
         (bounded by active span, not event count);
      2. the per-bucket observation is the LAST event in the bucket,
         picked deterministically by (us, event_id) row_number;
      3. `last(value, ignorenulls=True)` over an unbounded-preceding
         ROWS frame carries it forward — the first bucket is always
         observed (the spine starts at the user's first event), so the
         fill is total.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        "value",
        F.expr(f"unix_micros(ts) div {BUCKET_US}").alias("b"),
    )
    bounds = ev.groupBy("user_id").agg(
        F.min("b").alias("b0"), F.max("b").alias("b1")
    )
    spine = bounds.select(
        "user_id", F.explode(F.sequence("b0", "b1")).alias("b")
    )
    w_pick = Window.partitionBy("user_id", "b").orderBy(
        F.desc("us"), F.desc("event_id")
    )
    obs = (
        ev.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select("user_id", "b", F.col("value").alias("obs_value"))
    )
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(obs, ["user_id", "b"], "left")
        .select(
            "user_id",
            F.timestamp_micros(F.col("b") * BUCKET_US).alias("bucket_start"),
            F.last("obs_value", ignorenulls=True).over(w_fill).alias("value_ffill"),
            F.col("obs_value").isNotNull().alias("is_observed"),
            "b",
        )
        .orderBy("user_id", "b")
        .drop("b")
    )


INTERP_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value,
         epoch_us(ts) // {BUCKET_US} AS b
  FROM events
),
bounds AS (SELECT user_id, MIN(b) AS b0, MAX(b) AS b1 FROM e GROUP BY user_id),
spine AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS b FROM bounds),
obs AS (
  SELECT user_id, b, value FROM (
    SELECT user_id, b, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, b
                              ORDER BY us DESC, event_id DESC) AS rn
    FROM e
  ) WHERE rn = 1
),
neigh AS (
  SELECT s.user_id, s.b, o.value AS ov,
         last_value(o.value IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.b
           ROWS UNBOUNDED PRECEDING) AS pv,
         last_value(CASE WHEN o.value IS NOT NULL THEN s.b END IGNORE NULLS)
           OVER (PARTITION BY s.user_id ORDER BY s.b
                 ROWS UNBOUNDED PRECEDING) AS pb,
         first_value(o.value IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.b
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN o.value IS NOT NULL THEN s.b END IGNORE NULLS)
           OVER (PARTITION BY s.user_id ORDER BY s.b
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
  FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.b = o.b
)
SELECT user_id,
       make_timestamp(b * {BUCKET_US}) AS bucket_start,
       CAST(FLOOR(CAST((CASE WHEN ov IS NOT NULL THEN ov
            ELSE pv + (nv - pv) * CAST(b - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE)
            END) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0
         AS value_interp,
       ov IS NOT NULL AS is_observed
FROM neigh
ORDER BY user_id, b
"""


@plan("ts_interpolate_linear", oracle=INTERP_SQL)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's stream onto the hourly grid and fill gaps
    by LINEAR interpolation between the surrounding observations — the
    numeric companion to `ts_resample_ffill` (sensor/metric series
    want a slope through a gap, not a step).

    Neighbor discovery is two IGNORE-NULLS window scans over the same
    per-user spine (previous observation via unbounded-preceding
    last, next via unbounded-following first) — no self-join, no
    explode beyond the spine. The spine starts and ends on observed
    buckets, so every gap is interior and both neighbors exist; the
    interpolation `pv + (nv - pv) * (b - pb)/(nb - pb)` is written
    with the identical operation order in both engines and the output
    rides the FLOOR-quantize idiom. Same 100 TB shape as the ffill
    plan: everything partitions by user, shuffle keyed (user, bucket).
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        "value",
        F.expr(f"unix_micros(ts) div {BUCKET_US}").alias("b"),
    )
    bounds = ev.groupBy("user_id").agg(
        F.min("b").alias("b0"), F.max("b").alias("b1")
    )
    spine = bounds.select(
        "user_id", F.explode(F.sequence("b0", "b1")).alias("b")
    )
    w_pick = Window.partitionBy("user_id", "b").orderBy(
        F.desc("us"), F.desc("event_id")
    )
    obs = (
        ev.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select("user_id", "b", F.col("value").alias("ov"))
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("b")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_b = F.when(F.col("ov").isNotNull(), F.col("b"))
    neigh = spine.join(obs, ["user_id", "b"], "left").select(
        "user_id",
        "b",
        "ov",
        F.last("ov", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_b, ignorenulls=True).over(w_prev).alias("pb"),
        F.first("ov", ignorenulls=True).over(w_next).alias("nv"),
        F.first(obs_b, ignorenulls=True).over(w_next).alias("nb"),
    )
    from compendium_spark.functions.numeric import quantize6  # noqa: PLC0415

    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("b") - F.col("pb")).cast("double")
    ) / (F.col("nb") - F.col("pb")).cast("double")
    return (
        neigh.select(
            "user_id",
            F.timestamp_micros(F.col("b") * BUCKET_US).alias("bucket_start"),
            quantize6(
                F.when(F.col("ov").isNotNull(), F.col("ov")).otherwise(interp)
            ).alias("value_interp"),
            F.col("ov").isNotNull().alias("is_observed"),
            "b",
        )
        .orderBy("user_id", "b")
        .drop("b")
    )


# ---------------------------------------------------------------------------
# ts_ohlc_downsample — OHLC bar downsampling
# ---------------------------------------------------------------------------

OHLC_SQL = """
WITH cents AS (
  SELECT event_type, date_trunc('hour', ts) AS bar, event_id,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS v_cents
  FROM events
)
SELECT event_type,
       CAST(bar AS TIMESTAMP) AS bar,
       CAST(arg_min(v_cents, event_id) AS BIGINT) AS open_cents,
       CAST(MAX(v_cents) AS BIGINT) AS high_cents,
       CAST(MIN(v_cents) AS BIGINT) AS low_cents,
       CAST(arg_max(v_cents, event_id) AS BIGINT) AS close_cents,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(v_cents) AS BIGINT) AS volume_cents
FROM cents
GROUP BY event_type, bar
ORDER BY event_type, bar
"""


@plan("ts_ohlc_downsample", oracle=OHLC_SQL)
def ts_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar downsampling (round-7 addition): per (series, hour)
    bar with open/high/low/close/volume — the standard time-series
    compaction for metrics and market data, and the downsampling
    step a 100 TB observability pipeline runs continuously.

    Parity discipline: values quantize to integer CENTS at the scan
    (FLOOR(v·100+0.5), the proven integer-moments idiom), so every
    aggregate — including the cross-partition SUM — is exact BIGINT
    math; open/close are arg_min/arg_max keyed on the unique
    ingestion sequence (event_id), deterministic under any partition
    order. One shuffle on (series, bar), map-side combined;
    min_by/max_by are algebraic so the partial-aggregation story
    holds at scale.
    """
    ev = load(spark, sf_dir, "events")
    cents = ev.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bar"),
        "event_id",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("v_cents"),
    )
    return (
        cents.groupBy("event_type", "bar")
        .agg(
            F.min_by("v_cents", "event_id").cast("long").alias("open_cents"),
            F.max("v_cents").cast("long").alias("high_cents"),
            F.min("v_cents").cast("long").alias("low_cents"),
            F.max_by("v_cents", "event_id").cast("long").alias("close_cents"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("v_cents").cast("long").alias("volume_cents"),
        )
        .select(
            "event_type",
            F.col("bar").cast("timestamp").alias("bar"),
            "open_cents",
            "high_cents",
            "low_cents",
            "close_cents",
            "n_events",
            "volume_cents",
        )
        .orderBy("event_type", "bar")
    )


# ---------------------------------------------------------------------------
# ts_ewma — exact fixed-point exponentially-weighted moving average
# ---------------------------------------------------------------------------

EWMA_W = 8  # truncated window length; weights 2^(W-1-k), denominator 2^W - 1


def _ewma_sql() -> str:
    lags = ",\n         ".join(
        f"LAG(cents, {k}) OVER w AS l{k}" for k in range(1, EWMA_W)
    )
    num = " + ".join(
        ["cents * 128"]
        + [f"l{k} * {2 ** (EWMA_W - 1 - k)}" for k in range(1, EWMA_W)]
    )
    return f"""
WITH c AS (
  SELECT user_id, ts, event_id,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
lagged AS (
  SELECT user_id, ts, event_id, cents,
         {lags}
  FROM c
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, ts, event_id, cents,
       CAST({num} AS BIGINT) / 25500.0 AS ewma
FROM lagged
WHERE l{EWMA_W - 1} IS NOT NULL
ORDER BY user_id, ts, event_id
"""


@plan("ts_ewma", oracle=_ewma_sql())
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user series (round-7
    addition) — the smoothing primitive behind drift monitors and
    anomaly baselines, here in an EXACT FIXED-POINT form: α = 1/2
    truncated at W=8 lags gives integer weights 2^(W-1-k) and
    denominator 2^W - 1 = 255, so the weighted numerator is a plain
    BIGINT dot product over a LAG chain (Σ cents·2^(7-k), Horner's
    y=2y+x unrolled) and float enters ONCE in the final constant
    division. Naive recursive EWMA is a sequential float fold whose
    accumulation order no two engines share — this is the
    hash-stable (and, at 100 TB, the embarrassingly parallel) form:
    a keyed window of 7 LAGs, no carried state, no sequential scan.

    Rows with fewer than W-1 predecessors are warm-up and excluded
    (the truncated kernel would need a different normalizer per row).
    ~9.3k rows at sf0.01.

    No reference counterpart (pubdate bookkeeping only, SURVEY §2.7)
    — LLM-pipeline extension, time-series family.
    """
    c = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = c.select(
        "user_id",
        "ts",
        "event_id",
        "cents",
        *[
            F.lag("cents", k).over(w).alias(f"l{k}")
            for k in range(1, EWMA_W)
        ],
    )
    num = F.col("cents") * F.lit(128)
    for k in range(1, EWMA_W):
        num = num + F.col(f"l{k}") * F.lit(2 ** (EWMA_W - 1 - k))
    return (
        lagged.filter(F.col(f"l{EWMA_W - 1}").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            "cents",
            (num.cast("long") / F.lit(25500.0)).alias("ewma"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


# ---------------------------------------------------------------------------
# ts_seasonal_decompose — trend / seasonal / remainder over events
# ---------------------------------------------------------------------------

TREND_HALF_WINDOW = 12  # hours each side → 25-bucket centered MA

SEASONAL_SQL = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS y_cents
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
tr AS (
  SELECT event_type, hr, n_events, y_cents,
         CAST(SUM(y_cents) OVER wf AS BIGINT) AS w_sum,
         CAST(COUNT(*) OVER wf AS BIGINT) AS w_cnt
  FROM hourly
  WINDOW wf AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN {TREND_HALF_WINDOW} PRECEDING
                         AND {TREND_HALF_WINDOW} FOLLOWING)
),
de AS (
  SELECT event_type, hr, n_events, y_cents,
         CAST(FLOOR(w_sum * 1000000 / w_cnt) AS BIGINT) AS trend_mc,
         y_cents * 1000000
           - CAST(FLOOR(w_sum * 1000000 / w_cnt) AS BIGINT) AS detr_mc,
         CAST(EXTRACT(hour FROM hr) AS INT) AS hod
  FROM tr
),
seas AS (
  SELECT event_type, hod,
         CAST(SUM(detr_mc) AS BIGINT) AS s_sum,
         CAST(COUNT(*) AS BIGINT) AS s_cnt
  FROM de GROUP BY event_type, hod
)
SELECT d.event_type, d.hr AS hour, d.n_events,
       CAST(FLOOR(CAST((d.y_cents / 100.0) AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) / 1000000.0 AS y,
       CAST(FLOOR(CAST((d.trend_mc / 100000000.0) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS trend,
       CAST(FLOOR(CAST((se.s_sum / (se.s_cnt * 100000000.0)) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS seasonal,
       CAST(FLOOR(CAST((d.detr_mc / 100000000.0
                        - se.s_sum / (se.s_cnt * 100000000.0)) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS remainder
FROM de d
JOIN seas se ON d.event_type = se.event_type AND d.hod = se.hod
ORDER BY d.event_type, d.hr
"""


def _hourly_detrended(ev: DataFrame) -> DataFrame:
    """(event_type, hr, n_events, y_cents, trend_mc, detr_mc, hod) —
    the integer-exact hourly aggregation + centered-MA detrend shared
    by ts_seasonal_decompose and ts_anomaly_remainder: exact cent
    sums, FLOOR-divided micro-cent trend, BIGINT detrended series (no
    unordered float sum anywhere)."""
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    hourly = (
        ev.select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hr"),
            cents.alias("cents"),
        )
        .groupBy("event_type", "hr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("y_cents"),
        )
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-TREND_HALF_WINDOW, TREND_HALF_WINDOW)
    )
    tr = hourly.select(
        "event_type",
        "hr",
        "n_events",
        "y_cents",
        F.sum("y_cents").over(wf).cast("long").alias("w_sum"),
        F.count(F.lit(1)).over(wf).cast("long").alias("w_cnt"),
    )
    trend_mc = F.floor(
        F.col("w_sum") * F.lit(1000000) / F.col("w_cnt")
    ).cast("long")
    return tr.select(
        "event_type",
        "hr",
        "n_events",
        "y_cents",
        trend_mc.alias("trend_mc"),
        (F.col("y_cents") * F.lit(1000000) - trend_mc).alias("detr_mc"),
        F.hour("hr").alias("hod"),
    )


@plan("ts_seasonal_decompose", oracle=SEASONAL_SQL)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition of the hourly event-value
    series, per event type: trend = centered 25-bucket moving average,
    seasonal = mean detrended value per hour-of-day, remainder = what
    neither explains (the additive STL-lite every monitoring stack
    runs before alerting on the remainder).

    Exactness: the WHOLE decomposition is integer arithmetic — hourly
    sums are exact cents, the trend is a FLOOR-divided micro-cent
    BIGINT, the detrended series is a BIGINT, and the seasonal mean is
    an exact BIGINT sum divided once — so there is NO unordered float
    sum anywhere and the output is deterministic across engines AND
    across Spark partition orderings (the first cut averaged float
    detrended values; at sf0.1 its hour-of-day mean sat within 1e-13
    of a quantization boundary and flipped 5 cells run-to-run).
    Scale: one shuffle to the (type, hour) grid, whose cardinality is
    bounded by the TIME RANGE, not the event count; the trend window
    partitions by event_type (parallel across types, no global sort);
    the seasonal join is a types × 24-row frame AQE broadcasts on its
    own."""
    ev = load(spark, sf_dir, "events")
    de = _hourly_detrended(ev)
    seas = de.groupBy("event_type", "hod").agg(
        F.sum("detr_mc").cast("long").alias("s_sum"),
        F.count(F.lit(1)).cast("long").alias("s_cnt"),
    )
    s_raw = F.col("s_sum") / (F.col("s_cnt") * F.lit(100000000.0))
    from compendium_spark.functions.numeric import quantize6  # noqa: PLC0415

    return (
        de.join(seas, ["event_type", "hod"])
        .select(
            "event_type",
            F.col("hr").alias("hour"),
            "n_events",
            quantize6(F.col("y_cents") / F.lit(100.0)).alias("y"),
            quantize6(F.col("trend_mc") / F.lit(100000000.0)).alias("trend"),
            quantize6(s_raw).alias("seasonal"),
            quantize6(
                F.col("detr_mc") / F.lit(100000000.0) - s_raw
            ).alias("remainder"),
        )
        .orderBy("event_type", "hour")
    )


# ---------------------------------------------------------------------------
# ts_anomaly_remainder — alert on the decomposition remainder
# ---------------------------------------------------------------------------

# The consumer ts_seasonal_decompose's docstring promises: monitoring
# alerts on the REMAINDER (what neither trend nor seasonality
# explains), thresholded against a robust per-series scale — here
# K_MAD × the lower median of |remainder| (median, not stddev: one
# genuine outlier must not inflate its own detection threshold).
ANOMALY_K = 5  # threshold multiple of the per-type median |remainder|

ANOMALY_SQL = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS y_cents
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
tr AS (
  SELECT event_type, hr, n_events, y_cents,
         CAST(SUM(y_cents) OVER wf AS BIGINT) AS w_sum,
         CAST(COUNT(*) OVER wf AS BIGINT) AS w_cnt
  FROM hourly
  WINDOW wf AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN {TREND_HALF_WINDOW} PRECEDING
                         AND {TREND_HALF_WINDOW} FOLLOWING)
),
de AS (
  SELECT event_type, hr, n_events, y_cents,
         y_cents * 1000000
           - CAST(FLOOR(w_sum * 1000000 / w_cnt) AS BIGINT) AS detr_mc,
         CAST(EXTRACT(hour FROM hr) AS INT) AS hod
  FROM tr
),
seas AS (
  SELECT event_type, hod,
         CAST(SUM(detr_mc) AS BIGINT) AS s_sum,
         CAST(COUNT(*) AS BIGINT) AS s_cnt
  FROM de GROUP BY event_type, hod
),
rem AS (
  SELECT d.event_type, d.hr, d.n_events, d.y_cents,
         d.detr_mc - CAST(FLOOR(se.s_sum * 1.0 / se.s_cnt) AS BIGINT)
           AS rem_mc
  FROM de d JOIN seas se
    ON d.event_type = se.event_type AND d.hod = se.hod
),
med AS (
  SELECT event_type, abs_rem AS med_mc FROM (
    SELECT event_type, abs(rem_mc) AS abs_rem,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY abs(rem_mc), hr) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS cnt
    FROM rem
  ) WHERE rn = (cnt + 1) // 2
)
SELECT r.event_type, r.hr AS hour, r.n_events,
       CAST(FLOOR(CAST((r.y_cents / 100.0) AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) / 1000000.0 AS y,
       CAST(FLOOR(CAST((r.rem_mc / 100000000.0) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS remainder,
       CAST(FLOOR(CAST(({ANOMALY_K} * m.med_mc / 100000000.0) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS threshold
FROM rem r JOIN med m ON r.event_type = m.event_type
WHERE abs(r.rem_mc) > {ANOMALY_K} * m.med_mc
ORDER BY r.event_type, r.hr
"""


@plan("ts_anomaly_remainder", oracle=ANOMALY_SQL)
def ts_anomaly_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remainder-based anomaly detection — the alerting consumer the
    seasonal decomposition exists for: flag every (event_type, hour)
    cell whose |remainder| (hourly value minus trend minus hour-of-day
    seasonal) exceeds ANOMALY_K × the per-type LOWER MEDIAN of
    |remainder| (a robust scale: one genuine spike must not inflate
    its own detection threshold, which a stddev would).

    Exactness: reuses _hourly_detrended's integer pipeline; the
    seasonal term is FLOOR-divided to micro-cents so the remainder is
    a BIGINT, the median is an exact integer picked by ROW_NUMBER
    (rn = (cnt+1) div 2, ordered (|rem|, hr) — deterministic, no
    interpolated float median), and the anomaly predicate compares
    INTEGERS — no float anywhere in the decision path; floats appear
    only in the two display columns. Scale: the (type, hour) grid is
    bounded by the time range; the median window partitions by
    event_type (parallel across types, no global sort)."""
    ev = load(spark, sf_dir, "events")
    de = _hourly_detrended(ev)
    seas = de.groupBy("event_type", "hod").agg(
        F.sum("detr_mc").cast("long").alias("s_sum"),
        F.count(F.lit(1)).cast("long").alias("s_cnt"),
    )
    rem = de.join(seas, ["event_type", "hod"]).select(
        "event_type",
        "hr",
        "n_events",
        "y_cents",
        (
            F.col("detr_mc")
            - F.floor(F.col("s_sum") * F.lit(1.0) / F.col("s_cnt")).cast("long")
        ).alias("rem_mc"),
    )
    wmed = Window.partitionBy("event_type").orderBy(F.abs(F.col("rem_mc")), "hr")
    wcnt = Window.partitionBy("event_type")
    med = (
        rem.select(
            "event_type",
            F.abs(F.col("rem_mc")).alias("abs_rem"),
            F.row_number().over(wmed).alias("rn"),
            F.count(F.lit(1)).over(wcnt).alias("cnt"),
        )
        .filter(F.col("rn") == F.expr("(cnt + 1) div 2"))
        .select("event_type", F.col("abs_rem").alias("med_mc"))
    )
    from compendium_spark.functions.numeric import quantize6  # noqa: PLC0415

    return (
        rem.join(med, "event_type")
        .filter(F.abs(F.col("rem_mc")) > F.lit(ANOMALY_K) * F.col("med_mc"))
        .select(
            "event_type",
            F.col("hr").alias("hour"),
            "n_events",
            quantize6(F.col("y_cents") / F.lit(100.0)).alias("y"),
            quantize6(F.col("rem_mc") / F.lit(100000000.0)).alias("remainder"),
            quantize6(
                F.lit(ANOMALY_K) * F.col("med_mc") / F.lit(100000000.0)
            ).alias("threshold"),
        )
        .orderBy("event_type", "hour")
    )
