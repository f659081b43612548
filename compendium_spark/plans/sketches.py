"""Deterministic, cross-engine-exact sketch operators.

``a_approx_error_bound`` (plans/olap_ext.py) uses Spark's native HLL++
and KLL sketches — engine-specific internals, so it is rows-only in the
driver gate. These plans close that gap from the other direction:
the sketch ALGORITHM itself is implemented from first principles with
integer/bit-exact arithmetic, so the full sketch state and its estimate
are bit-identical on Spark and DuckDB and the driver can hash-compare
them like any relational plan.

* ``a20_hll_sketch`` — textbook HyperLogLog (Flajolet et al. 2007):
  md5-derived 32-bit hash, m=64 registers, max-of-rho per register,
  harmonic-mean estimate. Every intermediate is an integer except the
  final harmonic sum — and that sum is EXACT in IEEE doubles (each term
  is a power of two ≥ 2^-27 and the total stays below 2^7, so every
  partial sum fits the 53-bit mantissa with room to spare; order cannot
  change the value).
* ``a21_histogram_quantile`` — mergeable fixed-width-bin quantile
  sketch: integer bin counts (map-side combinable), cumulative walk,
  linear interpolation inside the target bin, with a within-one-bin
  accuracy check vs the exact quantile as an oracle-checked boolean.
* ``a22_hll_setops`` — HLL set algebra: two cohorts' register files
  merge into the union sketch by elementwise MAX (the mergeability
  property that makes sketches work on a 1000-executor fleet), and
  the intersection estimate falls out of inclusion–exclusion.

Reference parity note: no counterpart in the reference (relational ETL
only, reference db.py:89-186); these extend the brief's approximate-
aggregation axis with sketches whose correctness is *provable* in the
hash gate rather than merely bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from compendium_spark.functions.numeric import quantize6, sql_quantize
from compendium_spark.plans.registry import plan
from compendium_spark.tables import load

# ---------------------------------------------------------------------------
# a20: HyperLogLog with a cross-engine-exact register file
# ---------------------------------------------------------------------------

HLL_P = 6  # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_ALPHA = 0.709  # Flajolet et al. alpha_64
# hash = first 8 md5 hex digits -> uniform 32-bit word;
# bucket = low P bits, rho = leading-zeros(+1) of the remaining 26 bits
HLL_WBITS = 32 - HLL_P

_HEX = "0123456789abcdef"


def _sql_hex_to_long(md5_expr: str, ndigits: int) -> str:
    """DuckDB fragment: integer value of the first ``ndigits`` hex
    digits of ``md5_expr`` (digit-by-digit strpos arithmetic — DuckDB
    has no base-16 conv; same value as Spark's ``F.conv``)."""
    terms = [
        f"(strpos('{_HEX}', substr({md5_expr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (ndigits - 1 - i)}"
        for i in range(ndigits)
    ]
    return "(" + " + ".join(terms) + ")"


def _rho_case(w_expr: str) -> str:
    """Shared SQL CASE computing rho = (leading zeros of the
    ``HLL_WBITS``-bit word ``w_expr``) + 1: identical text runs on both
    engines (Spark ``F.expr`` and DuckDB), so the branch logic cannot
    diverge. w == 0 (all zeros) -> rho = WBITS + 1, per the paper."""
    whens = "\n".join(
        f"WHEN {w_expr} >= {1 << k} THEN {HLL_WBITS - k}"
        for k in range(HLL_WBITS - 1, -1, -1)
    )
    return f"CASE {whens} ELSE {HLL_WBITS + 1} END"


_HLL_EST = (
    f"{HLL_ALPHA} * {HLL_M * HLL_M} / "
    "(hsum + (64 - n_hit) * 1.0)"  # untouched registers contribute 2^-0 = 1
)

HLL_SQL = f"""
WITH h AS (
  SELECT event_type,
         {_sql_hex_to_long("md5(CAST(event_id AS VARCHAR))", 8)} AS hv
  FROM events
),
b AS (
  SELECT event_type,
         hv % {HLL_M} AS bucket,
         -- explicit FLOOR: DuckDB's / on integers is float division and
         -- its double->BIGINT cast ROUNDS (Spark's truncates); FLOOR
         -- makes both engines take the identical path (exact anyway:
         -- hv < 2^32 and 64 is a power of two)
         CAST(FLOOR(hv / {HLL_M}.0) AS BIGINT) AS w
  FROM h
),
regs AS (
  SELECT event_type, bucket, MAX({_rho_case("w")}) AS r
  FROM b
  GROUP BY event_type, bucket
),
sk AS (
  SELECT event_type,
         COUNT(*) AS n_hit,
         SUM(pow(2.0, -r)) AS hsum
  FROM regs
  GROUP BY event_type
),
ex AS (
  SELECT event_type, COUNT(DISTINCT event_id) AS exact_distinct
  FROM events
  GROUP BY event_type
)
SELECT sk.event_type,
       sk.n_hit AS registers_hit,
       {sql_quantize(_HLL_EST, 6)} AS hll_estimate,
       ex.exact_distinct,
       abs(({_HLL_EST}) - ex.exact_distinct)
         <= 0.35 * ex.exact_distinct AS within_3sigma
FROM sk JOIN ex ON sk.event_type = ex.event_type
ORDER BY sk.event_type
"""


@plan("a20_hll_sketch", oracle=HLL_SQL)
def a20_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch, implemented from scratch so
    the register file — not just an error bound — is hash-comparable
    across engines.

    Parity: the 32-bit hash is the first 8 md5 hex digits (Spark
    ``conv(..., 16, 10)`` = the oracle's digit-by-digit strpos
    arithmetic); bucket/word split is integer div/mod; rho comes from
    a shared SQL CASE evaluated verbatim by both engines; the register
    is an integer MAX; the harmonic sum is exact in doubles (powers of
    two only, see module docstring), so the final estimate is one
    multiply + one divide on bit-identical inputs.

    Scale: this is the mergeable-sketch shape — per-partition register
    files combine by elementwise MAX (here via groupBy(type, bucket)),
    the shuffle carries at most m=64 rows per group, and the corpus is
    read once. The production path for distinct-count at 100 TB; the
    exact COUNT(DISTINCT) sits alongside only as verification cost
    (same role as a_approx_error_bound's exact legs).
    """
    ev = load(spark, sf_dir, "events")
    hv = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    b = ev.select(
        "event_type",
        (hv % HLL_M).alias("bucket"),
        F.floor(hv / F.lit(float(HLL_M))).cast("long").alias("w"),
    )
    regs = b.groupBy("event_type", "bucket").agg(
        F.max(F.expr(_rho_case("w"))).alias("r")
    )
    sk = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hit"),
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("hsum"),
    )
    est = (
        F.lit(HLL_ALPHA)
        * F.lit(HLL_M * HLL_M)
        / (F.col("hsum") + (F.lit(64) - F.col("n_hit")) * F.lit(1.0))
    )
    ex = ev.groupBy("event_type").agg(
        F.count_distinct("event_id").alias("exact_distinct")
    )
    return (
        sk.join(F.broadcast(ex), "event_type")
        .select(
            "event_type",
            F.col("n_hit").alias("registers_hit"),
            quantize6(est).alias("hll_estimate"),
            "exact_distinct",
            (
                F.abs(est - F.col("exact_distinct"))
                <= F.lit(0.35) * F.col("exact_distinct")
            ).alias("within_3sigma"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# a21: fixed-width-bin histogram quantile sketch
# ---------------------------------------------------------------------------

HQ_WIDTH = 1000.0  # bin width over l_extendedprice (~900..105000)

_HQ_EST = "bin * 1000.0 + 1000.0 * (half_n - cum_before) / cnt"

HISTQ_SQL = f"""
WITH binned AS (
  SELECT l_returnflag,
         CAST(FLOOR(l_extendedprice / {HQ_WIDTH}) AS BIGINT) AS bin
  FROM lineitem
),
counts AS (
  SELECT l_returnflag, bin, COUNT(*) AS cnt
  FROM binned
  GROUP BY l_returnflag, bin
),
walk AS (
  SELECT l_returnflag, bin, cnt,
         CAST(SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
  FROM counts
),
hit AS (
  SELECT l_returnflag, bin, cnt, cum - cnt AS cum_before, n,
         0.5 * n AS half_n,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY bin) AS rn
  FROM walk
  WHERE cum >= 0.5 * n
),
sk AS (
  SELECT l_returnflag, n, bin AS median_bin,
         {_HQ_EST} AS est
  FROM hit WHERE rn = 1
),
ex AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.5) AS exact_median
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT sk.l_returnflag, sk.n, sk.median_bin,
       {sql_quantize("sk.est", 6)} AS est_median,
       {sql_quantize("ex.exact_median", 6)} AS exact_median,
       abs(sk.est - ex.exact_median) <= {HQ_WIDTH} AS within_bin_bound
FROM sk JOIN ex ON sk.l_returnflag = ex.l_returnflag
ORDER BY sk.l_returnflag
"""


@plan("a21_histogram_quantile", oracle=HISTQ_SQL)
def a21_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-width-bin quantile sketch: integer bin counts →
    cumulative walk → linear interpolation inside the median bin, with
    a within-one-bin accuracy check against the exact quantile emitted
    as an oracle-checked boolean.

    Accuracy contract (see tests/test_sketch.py): the estimate always
    lies in the median bin and within one bin width of the DISCRETE
    median; the within-one-bin bound vs the CONTINUOUS
    (quantile_cont) median additionally holds whenever both central
    order statistics fall in the median bin — guaranteed dense data
    like this one, but NOT a universal invariant (with n even the
    exact median can interpolate toward a far-away order statistic),
    so the boolean is an accuracy report, not a proof obligation.
    Either engine flipping it flips both (the inputs are
    bit-identical), so hash parity never depends on it.

    Parity: bin ids are FLOOR of a double division (identical IEEE op
    both engines), counts and cumulative sums are integers, and the
    interpolation is one division of exact integers — deterministic
    end to end, then FLOOR-quantized per the repo policy. The exact
    median leg uses the a13 idiom (both engines: linear interpolation).

    Scale: the sketch is the point — bin counts combine by addition
    (map-side partial agg), the shuffle carries one row per
    (group, bin), and the cumulative walk runs over a few hundred bins
    per group, not the data. Unlike exact quantiles (full sorted group
    in one place) this shape is oblivious to group row count; accuracy
    is governed by bin width alone. The exact leg exists only as
    verification cost, same as a20/a_approx_error_bound.
    """
    li = load(spark, sf_dir, "lineitem")
    from pyspark.sql import Window

    counts = (
        li.select(
            "l_returnflag",
            F.floor(F.col("l_extendedprice") / F.lit(HQ_WIDTH)).alias("bin"),
        )
        .groupBy("l_returnflag", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wcum = Window.partitionBy("l_returnflag").orderBy("bin")
    wall = Window.partitionBy("l_returnflag")
    walk = counts.select(
        "l_returnflag",
        "bin",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    hit = (
        walk.withColumn("half_n", F.lit(0.5) * F.col("n"))
        .filter(F.col("cum") >= F.col("half_n"))
        .withColumn("rn", F.row_number().over(wcum))
        .filter(F.col("rn") == 1)
    )
    est = F.col("bin") * F.lit(1000.0) + F.lit(1000.0) * (
        F.col("half_n") - (F.col("cum") - F.col("cnt"))
    ) / F.col("cnt")
    ex = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact_median")
    )
    return (
        hit.select("l_returnflag", "n", F.col("bin").alias("median_bin"), est.alias("est"))
        .join(F.broadcast(ex), "l_returnflag")
        .select(
            "l_returnflag",
            "n",
            "median_bin",
            quantize6(F.col("est")).alias("est_median"),
            quantize6(F.col("exact_median")).alias("exact_median"),
            (
                F.abs(F.col("est") - F.col("exact_median")) <= F.lit(HQ_WIDTH)
            ).alias("within_bin_bound"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# a22: HLL set operations — the mergeability payoff
# ---------------------------------------------------------------------------

# element = one (user, activity-day) pair; cohort A = days with a
# click, cohort B = days with a purchase — overlapping sets in the
# thousands, the regime where sketch set-algebra is meaningful.
_SETOP_KEY_SQL = (
    "CAST(user_id AS VARCHAR) || '-' || "
    "CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS VARCHAR)"
)

_EST = f"{HLL_ALPHA} * {HLL_M * HLL_M} / (hsum + ({HLL_M} - n_hit) * 1.0)"


def _sql_tag_est(tag: str, col: str) -> str:
    return f"MAX(CASE WHEN tag = '{tag}' THEN {col} END)"


HLL_SETOPS_SQL = f"""
WITH el AS (
  SELECT CASE WHEN event_type = 'click' THEN 'A' ELSE 'B' END AS tag,
         {_SETOP_KEY_SQL} AS key
  FROM events
  WHERE event_type IN ('click', 'purchase')
),
h AS (
  SELECT tag, {_sql_hex_to_long("md5(key)", 8)} AS hv FROM el
),
b AS (
  SELECT tag, hv % {HLL_M} AS bucket,
         CAST(FLOOR(hv / {HLL_M}.0) AS BIGINT) AS w
  FROM h
),
regs AS (
  SELECT tag, bucket, MAX({_rho_case("w")}) AS r
  FROM b GROUP BY tag, bucket
),
uregs AS (
  SELECT 'U' AS tag, bucket, MAX(r) AS r FROM regs GROUP BY bucket
),
allregs AS (SELECT * FROM regs UNION ALL SELECT * FROM uregs),
sk AS (
  SELECT tag, COUNT(*) AS n_hit, SUM(pow(2.0, -r)) AS hsum
  FROM allregs GROUP BY tag
),
est AS (SELECT tag, {_EST} AS e FROM sk),
exacts AS (
  SELECT tag, COUNT(DISTINCT key) AS x FROM el GROUP BY tag
  UNION ALL
  SELECT 'U' AS tag, COUNT(DISTINCT key) AS x FROM el
),
piv AS (
  SELECT
    (SELECT {_sql_tag_est("A", "e")} FROM est) AS ea,
    (SELECT {_sql_tag_est("B", "e")} FROM est) AS eb,
    (SELECT {_sql_tag_est("U", "e")} FROM est) AS eu,
    (SELECT {_sql_tag_est("A", "x")} FROM exacts) AS xa,
    (SELECT {_sql_tag_est("B", "x")} FROM exacts) AS xb,
    (SELECT {_sql_tag_est("U", "x")} FROM exacts) AS xu
)
SELECT
  {sql_quantize("ea", 6)} AS est_a, xa AS exact_a,
  abs(ea - xa) <= 0.35 * xa AS ok_a,
  {sql_quantize("eb", 6)} AS est_b, xb AS exact_b,
  abs(eb - xb) <= 0.35 * xb AS ok_b,
  {sql_quantize("eu", 6)} AS est_union, xu AS exact_union,
  abs(eu - xu) <= 0.35 * xu AS ok_union,
  {sql_quantize("ea + eb - eu", 6)} AS est_intersection,
  xa + xb - xu AS exact_intersection
FROM piv
"""


@plan("a22_hll_setops", oracle=HLL_SETOPS_SQL)
def a22_hll_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL set algebra — the property that justifies sketches at
    100 TB: two cohorts' register files (click-days vs purchase-days)
    merge into the UNION's sketch by elementwise register MAX, with no
    second pass over the data; the intersection falls out of
    inclusion–exclusion on three estimates. The union estimate is
    EXACTLY the sketch of the concatenated streams (max is
    associative/commutative/idempotent), so a 1000-executor fleet can
    sketch partitions independently and merge 64-integer states.

    Parity: same register pipeline as a20 (shared rho CASE, exact
    harmonic sums), merged and pivoted with integer/max ops only;
    the three estimates and inclusion–exclusion are arithmetic on
    bit-identical doubles. No bound boolean on the intersection —
    inclusion–exclusion error compounds and is NOT relatively bounded
    (can even go negative); the estimate is reported as-is, which is
    the honest contract.

    Scale: one scan of the filtered event stream; shuffles carry
    (tag, bucket) registers — ≤ 2m rows total — then ≤ 3m for the
    merge. The exact COUNT(DISTINCT key) legs are verification cost
    only, as in a20/a_approx_error_bound.
    """
    ev = load(spark, sf_dir, "events")
    el = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        F.when(F.col("event_type") == "click", F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("tag"),
        F.concat(
            F.col("user_id").cast("string"),
            F.lit("-"),
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("string"),
        ).alias("key"),
    )
    hv = F.conv(F.substring(F.md5(F.col("key")), 1, 8), 16, 10).cast("long")
    b = el.select(
        "tag",
        (hv % HLL_M).alias("bucket"),
        F.floor(hv / F.lit(float(HLL_M))).cast("long").alias("w"),
    )
    regs = b.groupBy("tag", "bucket").agg(
        F.max(F.expr(_rho_case("w"))).alias("r")
    )
    uregs = regs.groupBy("bucket").agg(F.max("r").alias("r")).select(
        F.lit("U").alias("tag"), "bucket", "r"
    )
    sk = (
        regs.unionByName(uregs)
        .groupBy("tag")
        .agg(
            F.count(F.lit(1)).alias("n_hit"),
            F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("hsum"),
        )
    )
    e = (
        F.lit(HLL_ALPHA)
        * F.lit(HLL_M * HLL_M)
        / (F.col("hsum") + (F.lit(HLL_M) - F.col("n_hit")) * F.lit(1.0))
    )
    est = sk.select("tag", e.alias("e"))
    # r8 dup-scan fix: both exact legs derive from ONE (tag, key)
    # distinct — the per-tag counts aggregate it directly and the
    # union count re-distincts the (already deduped) pairs on key, so
    # the two legs share the distinct's exchange (ReusedExchange,
    # asserted warm) instead of each re-scanning + re-distincting the
    # raw stream. Wall-time parity at sf0.1 (min-of-5: 0.73 s old vs
    # 0.83 s new — scan cost is noise at this SF); the change removes
    # one full-stream distinct SHUFFLE, which is the term that grows
    # at 100 TB.
    d = el.distinct()
    exacts = d.groupBy("tag").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    ).unionByName(
        d.select("key")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
        .select(F.lit("U").alias("tag"), "x")
    )

    # one conditional-aggregation pivot over 6 (tag, value) rows; the
    # exact counts ride in the same tall frame (tagged lowercase) so
    # the final form is ONE aggregate, no scalar-subquery BNLJ
    tall = est.select("tag", "e", F.lit(None).cast("long").alias("x")).unionByName(
        exacts.select("tag", F.lit(None).cast("double").alias("e"), "x")
    )
    row = tall.agg(
        F.max(F.when(F.col("tag") == "A", F.col("e"))).alias("ea"),
        F.max(F.when(F.col("tag") == "B", F.col("e"))).alias("eb"),
        F.max(F.when(F.col("tag") == "U", F.col("e"))).alias("eu"),
        F.max(F.when(F.col("tag") == "A", F.col("x"))).alias("xa"),
        F.max(F.when(F.col("tag") == "B", F.col("x"))).alias("xb"),
        F.max(F.when(F.col("tag") == "U", F.col("x"))).alias("xu"),
    )
    return row.select(
        quantize6(F.col("ea")).alias("est_a"),
        F.col("xa").alias("exact_a"),
        (F.abs(F.col("ea") - F.col("xa")) <= F.lit(0.35) * F.col("xa")).alias("ok_a"),
        quantize6(F.col("eb")).alias("est_b"),
        F.col("xb").alias("exact_b"),
        (F.abs(F.col("eb") - F.col("xb")) <= F.lit(0.35) * F.col("xb")).alias("ok_b"),
        quantize6(F.col("eu")).alias("est_union"),
        F.col("xu").alias("exact_union"),
        (F.abs(F.col("eu") - F.col("xu")) <= F.lit(0.35) * F.col("xu")).alias("ok_union"),
        quantize6(F.col("ea") + F.col("eb") - F.col("eu")).alias("est_intersection"),
        (F.col("xa") + F.col("xb") - F.col("xu")).alias("exact_intersection"),
    )


# ---------------------------------------------------------------------------
# a23: Count-Min sketch — point frequency estimates, mergeable by +
# ---------------------------------------------------------------------------

CM_D = 4  # hash rows
CM_W = 256  # counters per row

# row r's column for a token = 2 hex digits of md5(r || token): four
# independent 8-bit draws from one digest family


def _sql_cm_col(r: int) -> str:
    md5 = f"md5('{r}:' || token)"
    return (
        f"((strpos('{_HEX}', substr({md5}, 1, 1)) - 1) * 16"
        f" + (strpos('{_HEX}', substr({md5}, 2, 1)) - 1))"
    )


def _spark_cm_col(r: int):
    md5 = F.md5(F.concat(F.lit(f"{r}:"), F.col("token")))
    return F.conv(F.substring(md5, 1, 2), 16, 10).cast("long")


_CM_ROWS_SQL = " UNION ALL ".join(
    f"SELECT {r} AS r, {_sql_cm_col(r)} AS c, token FROM tok"
    for r in range(CM_D)
)

CM_SQL = f"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(lower(text)), ' +')) AS token
  FROM documents
),
placed AS ({_CM_ROWS_SQL}),
counters AS (
  SELECT r, c, COUNT(*) AS cnt FROM placed GROUP BY r, c
),
truth AS (
  SELECT token, COUNT(*) AS true_cnt FROM tok GROUP BY token
),
probes AS (
  SELECT DISTINCT t.token, t.true_cnt, p.r, p.c
  FROM truth t
  JOIN placed p ON p.token = t.token
),
est AS (
  SELECT pr.token, pr.true_cnt,
         MIN(co.cnt) AS cm_estimate
  FROM probes pr
  JOIN counters co ON co.r = pr.r AND co.c = pr.c
  GROUP BY pr.token, pr.true_cnt
),
n AS (SELECT COUNT(*) AS total FROM tok)
SELECT e.token,
       e.true_cnt,
       CAST(e.cm_estimate AS BIGINT) AS cm_estimate,
       e.cm_estimate >= e.true_cnt AS never_undercounts,
       e.cm_estimate - e.true_cnt <= 2 * n.total / {CM_W} AS within_eps
FROM est e CROSS JOIN n
ORDER BY e.true_cnt DESC, e.token
LIMIT 50
"""


@plan("a23_countmin_sketch", oracle=CM_SQL)
def a23_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over the token stream: d={CM_D} hash rows ×
    w={CM_W} counters, point estimate = MIN over the token's d
    counters. Completes the mergeable-sketch family (Misra-Gries a18,
    HLL a20/a22, histogram a21): CM state merges by elementwise
    ADDITION, so per-partition sketches combine associatively like any
    partial aggregate. The two CM guarantees ride along as
    oracle-checked booleans for the 50 most frequent tokens:
    never_undercounts (structural — MIN over counters that each
    include every occurrence) and the ε = 2/w additive bound (holds in
    expectation×d; deterministic here because both engines compute the
    identical counters).

    Parity: counters and estimates are pure integers from md5-digit
    arithmetic (conv = strpos polynomial). No floats.

    Scale: the counter table is d·w = {CM_D * CM_W} rows regardless of
    corpus size — the shuffle carries placed (r, c) keys that
    partial-aggregate map-side; probing joins the tiny counter table
    back (broadcast). The exact truth leg is verification cost, as in
    every sketch twin.

    Shape note (round-6 explain iteration): everything derives from
    the per-token COUNT aggregate, computed ONCE and lazily
    checkpointed — counter(r, c) = Σ true_cnt over tokens hashing
    there is algebraically the occurrence count, all {CM_D} hash rows
    explode from one array projection, and the stream total is
    Σ true_cnt. The first-green form re-scanned documents 10× (4-way
    union of the token stream, referenced twice, plus truth and
    total legs); this one scans it once.
    """
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), " +")).alias("token")
    )
    counts = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .localCheckpoint(eager=False)
    )
    placed = counts.select(
        "token",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), _spark_cm_col(r).alias("c")
                    )
                    for r in range(CM_D)
                ]
            )
        ).alias("rc"),
    ).select("token", "true_cnt", F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
    counters = placed.groupBy("r", "c").agg(
        F.sum("true_cnt").cast("long").alias("cnt")
    )
    est = (
        placed.join(F.broadcast(counters), ["r", "c"])
        .groupBy("token", "true_cnt")
        .agg(F.min("cnt").alias("cm_estimate"))
    )
    total = counts.agg(F.sum("true_cnt").cast("long").alias("total"))
    return (
        est.join(F.broadcast(total))
        .select(
            "token",
            "true_cnt",
            F.col("cm_estimate").cast("long").alias("cm_estimate"),
            (F.col("cm_estimate") >= F.col("true_cnt")).alias(
                "never_undercounts"
            ),
            (
                F.col("cm_estimate") - F.col("true_cnt")
                <= 2 * F.col("total") / F.lit(CM_W)
            ).alias("within_eps"),
        )
        .orderBy(F.desc("true_cnt"), "token")
        .limit(50)
    )
