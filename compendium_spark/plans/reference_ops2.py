"""SURVEY §2 operator inventory, part 2 — the remaining reference
operators re-expressed over the testdata schema, each oracle-checked.

Covers: P1/P3/P8/P10 (filters), J5/J6 (anti-join project selection,
partial-update MERGE), A6+A7 (threshold disposition aggregate),
A9 (majority-vote mode), F5-F7 (null-safe ratio math). Citations are
``/root/reference/<file>:<line>``.

Parity notes: every fraction is computed as SUM(int)/COUNT (exact
integers → identical IEEE double in both engines); percent formatting
uses FLOOR before the int cast because Spark's double→int cast
truncates while DuckDB's rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from compendium_spark.functions.numeric import quantize6
from compendium_spark.plans.registry import plan
from compendium_spark.tables import load, maybe_broadcast

DEC = "decimal(18,4)"

# ---------------------------------------------------------------------------
# Filters (P1, P3, P8, P10)
# ---------------------------------------------------------------------------

P1_SQL = """
SELECT c_custkey FROM customer ORDER BY c_custkey
"""


@plan("p1_ordered_key_scan", oracle=P1_SQL)
def p1_ordered_key_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered single-key projection (ref `db.py:217`: SELECT srs FROM
    samples ORDER BY 1 — the preloaded key list that seeds the
    anti-join ingest J2). One pruned column, one range-partitioned
    sort; at scale this is the materialization you'd skip entirely in
    favor of the distributed anti-join (J2)."""
    return load(spark, sf_dir, "customer").select("c_custkey").orderBy("c_custkey")


P3_SQL = """
SELECT l_suppkey, COUNT(*) AS backlog
FROM lineitem
WHERE nullif(l_tax, 0) IS NULL
GROUP BY l_suppkey
ORDER BY l_suppkey
"""


@plan("p3_null_work_queue", oracle=P3_SQL)
def p3_null_work_queue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-predicate work queue (ref `db.py:278-280`: WHERE srr IS
    NULL — samples still awaiting enrichment). Testdata has no native
    NULLs, so the missing-value domain is derived with nullif (the
    same null-generation the QC engine uses for zero denominators,
    F6). Filter pushes to the scan; the backlog count per key is one
    partial-agg shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.nullif(F.col("l_tax"), F.lit(0)).isNull())
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("backlog"))
        .orderBy("l_suppkey")
    )


P8_SQL = """
SELECT doc_id,
       len(list_filter(string_split_regex(text, '\\s+'),
                       x -> length(x) >= 7)) AS n_long
FROM documents
WHERE len(list_filter(string_split_regex(text, '\\s+'),
                      x -> length(x) >= 7)) > 0
ORDER BY doc_id
"""


@plan("p8_nonempty_array_filter", oracle=P8_SQL)
def p8_nonempty_array_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-if-empty array filter (ref `db.py:433-438`: EXPERIMENT
    packages with no RUN accession are dropped → filter(size(runs) >
    0)). Tokenize → lambda-filter → cardinality, all inside codegen;
    no shuffle, no UDF."""
    docs = load(spark, sf_dir, "documents")
    long_toks = F.filter(
        F.split(F.col("text"), r"\s+"), lambda x: F.length(x) >= 7
    )
    return (
        docs.select("doc_id", F.size(long_toks).alias("n_long"))
        .filter(F.col("n_long") > 0)
        .orderBy("doc_id")
    )


P10_SQL = """
SELECT doc_id,
       CAST(FLOOR(CAST((length(replace(text, ' ', '')) * 1.0 / length(text)) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS span_frac
FROM documents
WHERE length(replace(text, ' ', '')) * 1.0 / length(text) > 0.82
ORDER BY doc_id
"""


@plan("p10_proportional_span_filter", oracle=P10_SQL)
def p10_proportional_span_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional-length acceptance filter (ref `amplicon.py:69-73`:
    keep an alignment only if its span exceeds 70% of the ASV length).
    Here: keep documents whose non-whitespace span exceeds 82% of
    total length. Pure scalar predicate — pushed down, zero shuffle."""
    docs = load(spark, sf_dir, "documents")
    frac = (
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        * F.lit(1.0)
        / F.length("text")
    )
    return (
        docs.select("doc_id", frac.alias("_f"))
        .filter(F.col("_f") > 0.82)
        .select("doc_id", quantize6("_f").alias("span_frac"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Joins (J5 anti-selection, J6 partial-update MERGE)
# ---------------------------------------------------------------------------

J5_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderstatus = 'O' AND o_orderpriority = '1-URGENT'
)
ORDER BY c_custkey
"""


@plan("j5_membership_anti", oracle=J5_SQL)
def j5_membership_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership anti-filter on project selection (ref
    `management.py:95-125` `find_todo`; fixes quirk Q3 — the
    reference compares tuples to strings so its exclusion never fires;
    SURVEY §7.4). The filtered right side is a constant-selectivity
    slice of orders — it SCALES with SF, so the broadcast hint is
    size-gated on the orders footprint (maybe_broadcast) rather than
    forced; past the budget it is a plain shuffled anti-join (AQE
    still broadcast-converts when the filtered side turns out
    small)."""
    cust = load(spark, sf_dir, "customer")
    urgent_open = maybe_broadcast(
        spark,
        sf_dir,
        "orders",
        load(spark, sf_dir, "orders").filter(
            (F.col("o_orderstatus") == "O")
            & (F.col("o_orderpriority") == "1-URGENT")
        ),
    )
    return (
        cust.join(
            urgent_open,
            cust.c_custkey == urgent_open.o_custkey,
            "left_anti",
        )
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


J6_SQL = """
SELECT c.c_custkey,
       CAST(CAST(c.c_acctbal AS DECIMAL(18,4)) AS DOUBLE) AS old_acctbal,
       CAST(coalesce(u.urgent_max, CAST(c.c_acctbal AS DECIMAL(18,4)))
            AS DOUBLE) AS new_acctbal,
       u.latest_f_date
FROM customer c
LEFT JOIN (
  SELECT o_custkey,
         max(CASE WHEN o_orderpriority = '1-URGENT'
                  THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS urgent_max,
         strftime(max(o_orderdate), '%Y-%m-%d') AS latest_f_date
  FROM orders
  WHERE o_orderstatus = 'F'
  GROUP BY o_custkey
) u ON c.c_custkey = u.o_custkey
ORDER BY c.c_custkey
"""


@plan("j6_partial_update_merge", oracle=J6_SQL)
def j6_partial_update_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-update MERGE semantics (ref `db.py:440-470`: the
    enrichment UPDATE only overwrites fields the fetch actually
    returned — i.e. coalesce(new, old) per column; unmatched keys keep
    every old value). Expressed as target LEFT JOIN staged-updates +
    coalesce — exactly the read side of the Delta MERGE the batch
    writer (operators/merge.py) performs. The staged-updates aggregate
    is usually tiny relative to the target (one enrichment batch), but
    it derives from the SF-scaling orders table, so the broadcast hint
    is size-gated (maybe_broadcast) — under the budget the target
    never shuffles; past it the join degrades to a shuffled merge."""
    cust = load(spark, sf_dir, "customer")
    updates = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(
            F.max(
                F.when(
                    F.col("o_orderpriority") == "1-URGENT",
                    F.col("o_totalprice").cast(DEC),
                )
            ).alias("urgent_max"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("latest_f_date"),
        )
    )
    updates = maybe_broadcast(spark, sf_dir, "orders", updates)
    return (
        cust.join(updates, cust.c_custkey == updates.o_custkey, "left")
        .select(
            "c_custkey",
            F.col("c_acctbal").cast(DEC).cast("double").alias("old_acctbal"),
            F.coalesce(F.col("urgent_max"), F.col("c_acctbal").cast(DEC))
            .cast("double")
            .alias("new_acctbal"),
            "latest_f_date",
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Aggregations (A6+A7 disposition, A9 majority vote)
# ---------------------------------------------------------------------------

A6_SQL = """
WITH stats AS (
  SELECT l_suppkey,
         COUNT(*) AS sample_count,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 1.0
           / COUNT(*) AS frac_r,
         SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) * 1.0
           / COUNT(*) AS frac_a,
         SUM(CASE WHEN l_quantity < 10 THEN 1 ELSE 0 END) * 1.0
           / COUNT(*) AS frac_lowqty
  FROM lineitem GROUP BY l_suppkey
),
flagged AS (
  SELECT *,
         coalesce(frac_r > 0.34, FALSE) AS re_run,
         (NOT coalesce(frac_r > 0.34, FALSE))
           AND (coalesce(frac_a > 0.34, FALSE)
                OR coalesce(frac_lowqty > 0.19, FALSE)) AS discard
  FROM stats
)
SELECT l_suppkey, sample_count,
       CAST(FLOOR(CAST((frac_r) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS frac_r,
       CAST(FLOOR(CAST((frac_a) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS frac_a,
       CAST(FLOOR(CAST((frac_lowqty) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS frac_lowqty,
       re_run, discard,
       CASE WHEN discard THEN 'discard'
            WHEN re_run THEN 're_run'
            ELSE 'save' END AS decision,
       coalesce(array_to_string(list_filter([
         CASE WHEN re_run THEN
           printf('%d%% of lines flagged R.', CAST(FLOOR(frac_r * 100) AS INT)) END,
         CASE WHEN NOT re_run AND coalesce(frac_a > 0.34, FALSE) THEN
           printf('%d%% of lines flagged A.', CAST(FLOOR(frac_a * 100) AS INT)) END,
         CASE WHEN NOT re_run AND coalesce(frac_lowqty > 0.19, FALSE) THEN
           printf('%d%% of lines low quantity.',
                  CAST(FLOOR(frac_lowqty * 100) AS INT)) END
       ], x -> x IS NOT NULL), '|'), '') AS errors
FROM flagged
ORDER BY l_suppkey
"""


@plan("a6_threshold_disposition", oracle=A6_SQL)
def a6_threshold_disposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold decision aggregate (A6+A7, ref `projects.py:281-311`
    + count at `projects.py:226`): per-group flagged proportions →
    re_run / discard flags with the reference's short-circuit (a
    re_run group skips the discard checks, `projects.py:294-296`) and
    its `int(p*100)%%` error strings (`projects.py:285-311`). Same
    when()-chain shape as functions/qc.py project_disposition, here
    over testdata so the oracle can hash it. One hash-agg shuffle on
    the group key; the flag logic is scalar on ~|groups| rows."""
    li = load(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    frac = lambda c: F.sum(c.cast("int")) / n  # noqa: E731
    stats = li.groupBy("l_suppkey").agg(
        n.alias("sample_count"),
        frac(F.col("l_returnflag") == "R").alias("frac_r"),
        frac(F.col("l_returnflag") == "A").alias("frac_a"),
        frac(F.col("l_quantity") < 10).alias("frac_lowqty"),
    )
    flag = lambda c: F.coalesce(c, F.lit(False))  # noqa: E731
    re_run = flag(F.col("frac_r") > 0.34)
    discard = ~re_run & (flag(F.col("frac_a") > 0.34) | flag(F.col("frac_lowqty") > 0.19))
    pct = lambda c: F.floor(F.col(c) * 100).cast("int")  # noqa: E731
    msg = F.format_string
    errors = F.concat_ws(
        "|",
        F.array_compact(
            F.array(
                F.when(re_run, msg("%d%% of lines flagged R.", pct("frac_r"))),
                F.when(
                    ~re_run & flag(F.col("frac_a") > 0.34),
                    msg("%d%% of lines flagged A.", pct("frac_a")),
                ),
                F.when(
                    ~re_run & flag(F.col("frac_lowqty") > 0.19),
                    msg("%d%% of lines low quantity.", pct("frac_lowqty")),
                ),
            )
        ),
    )
    return (
        stats.select(
            "l_suppkey",
            "sample_count",
            quantize6("frac_r").alias("frac_r"),
            quantize6("frac_a").alias("frac_a"),
            quantize6("frac_lowqty").alias("frac_lowqty"),
            re_run.alias("re_run"),
            discard.alias("discard"),
            F.when(discard, "discard").when(re_run, "re_run").otherwise("save").alias(
                "decision"
            ),
            errors.alias("errors"),
        )
        .orderBy("l_suppkey")
    )


A9_SQL = """
WITH c AS (
  SELECT o_custkey, o_orderpriority AS v, COUNT(*) AS n
  FROM orders GROUP BY o_custkey, o_orderpriority
),
t AS (SELECT o_custkey, COUNT(*) AS tot FROM orders GROUP BY o_custkey),
r AS (
  SELECT c.o_custkey AS custkey, v, n, tot,
         ROW_NUMBER() OVER (PARTITION BY c.o_custkey
                            ORDER BY n DESC, v) AS rn
  FROM c JOIN t ON c.o_custkey = t.o_custkey
)
SELECT custkey,
       CASE WHEN n * 2 > tot THEN v ELSE '<none>' END AS majority_value,
       n AS votes, tot AS total
FROM r WHERE rn = 1
ORDER BY custkey
"""


@plan("a9_majority_vote", oracle=A9_SQL)
def a9_majority_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-vote mode (A9, ref `amplicon.py:60-89`: accept a
    region once its tally exceeds half the project's ASVs, else
    undetermined). The reference's early-exit loop becomes a full
    tally + windowed argmax — cheaper per unit and parallel across
    groups. Two shuffles on the same key (tally, then window) — AQE
    coalesces them; ties break deterministically on the value."""
    orders = load(spark, sf_dir, "orders")
    tally = orders.groupBy(
        F.col("o_custkey").alias("custkey"), F.col("o_orderpriority").alias("v")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = F.sum("n").over(Window.partitionBy("custkey"))
    w = Window.partitionBy("custkey").orderBy(F.desc("n"), "v")
    return (
        tally.select("custkey", "v", "n", tot.alias("tot"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "custkey",
            F.when(F.col("n") * 2 > F.col("tot"), F.col("v"))
            .otherwise("<none>")
            .alias("majority_value"),
            F.col("n").alias("votes"),
            F.col("tot").alias("total"),
        )
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# Scalar ratio math with null-safe flags (F5-F7)
# ---------------------------------------------------------------------------

F5_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(FLOOR(CAST((CAST(l_discount AS DOUBLE) / nullif(CAST(l_tax AS DOUBLE), 0)) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0
         AS disc_tax_ratio,
       coalesce(CAST(l_discount AS DOUBLE)
                  / nullif(CAST(l_tax AS DOUBLE), 0) > 1.0, FALSE) AS flag_high,
       CAST(FLOOR(CAST((CAST(l_quantity AS DOUBLE) / 50.0) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS retained_frac,
       CAST(l_quantity AS DOUBLE) / 50.0 < 0.2 AS flag_low
FROM lineitem
WHERE l_orderkey < 5000
ORDER BY l_orderkey, l_linenumber
"""


@plan("f_ratio_nullsafe", oracle=F5_SQL)
def f_ratio_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio math with null-division semantics (F5-F7, ref
    `projects.py:599-629`): a zero denominator makes the ratio NULL
    (the reference's bare try/except) and the threshold flag
    coalesces to False (`projects.py:603-610`). All scalar, codegen'd,
    filter pushed to the scan."""
    li = load(spark, sf_dir, "lineitem")
    ratio = F.col("l_discount").cast("double") / F.nullif(
        F.col("l_tax").cast("double"), F.lit(0)
    )
    retained = F.col("l_quantity").cast("double") / F.lit(50.0)
    return (
        li.filter(F.col("l_orderkey") < 5000)
        .select(
            "l_orderkey",
            "l_linenumber",
            quantize6(ratio).alias("disc_tax_ratio"),
            F.coalesce(ratio > 1.0, F.lit(False)).alias("flag_high"),
            quantize6(retained).alias("retained_frac"),
            (retained < 0.2).alias("flag_low"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


J9_SQL = """
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_quantity >= 48 AND l_returnflag = 'R'
)
ORDER BY o_orderkey
"""


@plan("j9_semi_join", oracle=J9_SQL)
def j9_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — membership keep-filter, the positive twin of
    the ingest anti-join (J2): orders having at least one large
    returned line. Produces only left-side columns, dedups matches for
    free, and never materializes the pair blow-up an inner join +
    distinct would."""
    orders = load(spark, sf_dir, "orders")
    flagged = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 48) & (F.col("l_returnflag") == "R")
    )
    return (
        orders.join(flagged, orders.o_orderkey == flagged.l_orderkey, "left_semi")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderkey")
    )
