"""Sink round-trips (VERDICT r10 #4) — the write paths, oracle-gated.

Every other operator class already carries a driver-green CORRECTNESS
row; the sinks (K1 insert, K3 accession list, K4 processed sources,
K5 tar.gz archive — ref `projects.py:82-85`, `helpers.py:1-23`,
`projects.py:525-551`) were pytest-only. These plans close that gap
with the ingest-plan pattern in reverse: a fixture goes through the
REAL sink (Warehouse write/append, cmd_accessions, filter_sources,
tar_archive), the artifact is read back off disk, and the result is
value-hashed against a DuckDB oracle that re-derives the expected
artifact content independently from the same fixture embedded as SQL
literals. Like `plans/ingest.py`, they ignore ``sf_dir``: the unit
under test is the sink machinery, so identical output at every SF is
expected.

Scale notes per plan are inline; the shared shape: sinks stage to a
scratch dir that is wiped per run (idempotent — re-running a plan
never double-appends), and the read-back side is a plain
spark.read.text / bounded driver listing, never a corpus-sized
collect.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tarfile
from pathlib import Path
from types import SimpleNamespace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from compendium_spark.localframe import arrow_local_df, local_df
from compendium_spark.plans.ingest import SOURCES_TXT, _sources_sql, _sql_text
from compendium_spark.plans.registry import plan

def _one_slice_df(spark: SparkSession, rows, schema) -> DataFrame:
    """A fixture DataFrame that is ONE partition from birth — the
    single-file commit shape the compaction/skipping fixtures need.
    ``createDataFrame(rows).coalesce(1)`` is the wrong way to get it:
    the local rows land in defaultParallelism slices and the coalesced
    single task then pays one serial Python-worker roundtrip PER
    parent slice (~4 s of pure scheduling for 3 rows on local[32]).

    r14: built from a pyarrow Table instead of a pickled-rows RDD.
    A parallelize-backed frame re-runs a PYTHON WORKER roundtrip on
    every action that touches it (~250 ms/action measured for a 5-row
    frame; each warehouse commit's write job pays it), while an
    arrow-table frame scans JVM-side batches (noop write 260 → 46 ms,
    parquet write 321 → 144 ms). coalesce(1) keeps the single-slice
    birth contract (narrow, preserves row order, no Python boundary);
    schema equality and row parity vs the RDD path are pinned in
    tests/test_r14_sink_fixture.py. Falls back to the RDD path for
    any value pyarrow cannot coerce — or any non-positional row shape
    (a Row/dict binds by NAME in the stock path; zip-by-position
    would misbind it) — via localframe.arrow_local_df (guide §4: keep
    the boundary out of the hot path, not out of reach)."""
    rows = list(rows)
    fast = arrow_local_df(spark, rows, schema)
    if fast is not None:
        return fast.coalesce(1)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )


def _workdir(name: str) -> Path:
    """Per-uid scratch dir for one sink plan, wiped on entry so the
    round-trip is idempotent (an append sink re-run against last run's
    warehouse would otherwise double its rows)."""
    import tempfile  # noqa: PLC0415

    d = Path(tempfile.gettempdir()) / f"compendium_spark_sinks_{os.getuid()}" / name
    shutil.rmtree(d, ignore_errors=True)
    d.mkdir(parents=True, exist_ok=True)
    return d


# ---------------------------------------------------------------------------
# K1 + K3: warehouse insert → accession-list file → read-back
# ---------------------------------------------------------------------------

# (srs, project, taxon, srr[], library_strategy, library_source) — the
# eligibility axes of ref projects.py:67-73: empty srr, wrong source,
# wrong strategy, wrong project, plus a cross-sample duplicate run
# (SRR9_2) the DISTINCT must fold.
ACC_SAMPLES = [
    ("SRS1", "PRJ9", "txidA", ["SRR9_2", "SRR9_1"], "AMPLICON", "METAGENOMIC"),
    ("SRS2", "PRJ9", "txidA", ["SRR9_2", "SRR9_3"], "AMPLICON", "GENOMIC"),
    ("SRS3", "PRJ9", "txidB", [], "AMPLICON", "METAGENOMIC"),
    ("SRS4", "PRJ9", "txidB", ["SRR9_4"], "AMPLICON", "SYNTHETIC"),
    ("SRS5", "PRJ9", "txidB", ["SRR9_5"], "WGS", "METAGENOMIC"),
    ("SRS6", "PRJX", "txidA", ["SRRX_1"], "AMPLICON", "METAGENOMIC"),
]


def _acc_sql() -> str:
    rows = ", ".join(
        "('{}', '{}', [{}], '{}', '{}')".format(
            srs,
            project,
            ", ".join(f"'{r}'" for r in srr),
            strat,
            src,
        )
        for srs, project, _taxon, srr, strat, src in ACC_SAMPLES
    )
    return f"""
WITH samples_fx(srs, project, srr, library_strategy, library_source) AS (
  VALUES {rows}
),
elig AS (
  SELECT * FROM samples_fx
  WHERE len(srr) > 0
    AND library_source IN ('GENOMIC', 'METAGENOMIC')
    AND library_strategy = 'AMPLICON'
    AND project = 'PRJ9'
)
SELECT DISTINCT unnest(srr) AS srr FROM elig ORDER BY srr
"""


@plan("sink_accessions_roundtrip", oracle=_acc_sql())
def sink_accessions_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1+K3 round-trip (ref `projects.py:82-85`): the fixture samples
    go through the REAL `Warehouse.write` then `Warehouse.append`
    (K1 — schema-validated, taxon-partitioned insert), the REAL
    `cli.cmd_accessions` derives the eligible runs and writes the
    accession-list text file (K3 — explode srr, DISTINCT, sorted,
    one accession per line), and the plan's output is that file read
    back. Oracle = independent VALUES re-derivation of eligibility +
    unnest + DISTINCT.

    Shape: the sink's only driver materialization is the accession
    list itself (the reference's deliverable is this file); the
    eligibility filter + explode + distinct run as one shuffle on srr.
    At 100 TB the same plan writes through df.write.text instead of a
    driver loop — cmd_accessions documents that seam."""
    from compendium_spark.cli import cmd_accessions  # noqa: PLC0415
    from compendium_spark.schemas import SAMPLES  # noqa: PLC0415
    from compendium_spark.storage import Warehouse  # noqa: PLC0415

    wd = _workdir("accessions")
    wh = Warehouse(spark, str(wd / "warehouse"))
    full = [
        (srs, project, taxon, srr, strat, src, None, None, None, None)
        for srs, project, taxon, srr, strat, src in ACC_SAMPLES
    ]
    head = local_df(spark, full[:3], SAMPLES)
    tail = local_df(spark, full[3:], SAMPLES)
    wh.write("samples", head)
    wh.append("samples", tail)  # K1: insert into the live table
    out = wd / "accessions.txt"
    # the CLI's user-facing progress print goes to stderr here: plans
    # run inside bench/doc generators whose STDOUT is machine-parsed
    # (the r13 SCALING.md regen caught stray "wrote N accessions"
    # lines in the redirect)
    import contextlib  # noqa: PLC0415
    import sys  # noqa: PLC0415

    with contextlib.redirect_stdout(sys.stderr):
        cmd_accessions(wh, SimpleNamespace(project="PRJ9", out=str(out)))
    return (
        spark.read.text(str(out))
        .select(F.col("value").alias("srr"))
        .orderBy("srr")
    )


# ---------------------------------------------------------------------------
# K4: processed-sources sink → read-back
# ---------------------------------------------------------------------------


@plan("sink_sources_roundtrip", oracle=_sources_sql())
def sink_sources_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 round-trip (ref `helpers.py:1-23` output file): the shared
    SOURCES_TXT fixture goes through the REAL `filter_sources` —
    classify + `source\\tdecision` lines written via df.write.text —
    and the plan's output is the written artifact read back and
    re-split. Same oracle as `ing_sources_decisions` (that plan gates
    the classifier; this one gates that what lands ON DISK decodes to
    the same relation).

    Shape: the sink is a distributed text write (coalesce(1) here only
    because the reference emits one file; at scale drop the coalesce
    and the sink is embarrassingly parallel)."""
    from compendium_spark.functions.sources_filter import (  # noqa: PLC0415
        filter_sources,
    )

    wd = _workdir("sources")
    infile = wd / "sources.txt"
    infile.write_text(SOURCES_TXT)
    outdir = wd / "decided"
    filter_sources(spark, str(infile), str(outdir))
    return (
        spark.read.text(str(outdir))
        .select(
            F.split_part(F.col("value"), F.lit("\t"), F.lit(1)).alias("source"),
            F.split_part(F.col("value"), F.lit("\t"), F.lit(2)).alias(
                "decision"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# K5: tar.gz archive sink → member read-back
# ---------------------------------------------------------------------------

ARCHIVE_FILES = {
    "summary.tsv": (
        "\tdinput\tfilter\tnonchim\n"
        "SRR900001_1.fastq\t1000\t900\t800\n"
    ),
    "ASVs_counts.tsv": "\tSRR900001\nASV_1\t42\n",
    "logs/dada2.log": "dada2 finished ok\n",
}


def _archive_sql() -> str:
    rows = ", ".join(
        f"('PRJ9/{name}', {_sql_text(text)})"
        for name, text in sorted(ARCHIVE_FILES.items())
    )
    return f"""
WITH files(member, content) AS (VALUES {rows})
SELECT member,
       CAST(strlen(content) AS BIGINT) AS n_bytes,
       md5(content) AS content_md5
FROM files ORDER BY member
"""


@plan("sink_archive_roundtrip", oracle=_archive_sql())
def sink_archive_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 round-trip (ref `projects.py:530-548`): a staged project dir
    (summary + ASV counts + nested log) goes through the REAL
    `orchestrate.tar_archive` adapter, then the archive is opened and
    every member's (name, size, md5) is extracted; oracle = the same
    fixture literals hashed by DuckDB's md5. Proves the archive holds
    exactly the project's files, rooted at the project name, nested
    dirs preserved, contents byte-identical.

    Shape: archives are per-project (bounded) driver/executor-local
    tarfile work by design — the reference's archive unit is one
    project directory; a 100 TB warehouse archives many projects in
    parallel, each bounded."""
    from compendium_spark.pipeline.orchestrate import tar_archive  # noqa: PLC0415

    wd = _workdir("archive")
    proj = wd / "projects" / "PRJ9"
    for name, text in ARCHIVE_FILES.items():
        p = proj / name
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(text)
    tar_archive(str(wd / "projects"), str(wd / "archive"))("PRJ9")
    rows = []
    with tarfile.open(wd / "archive" / "PRJ9.tar.gz", "r:gz") as tf:
        for m in tf.getmembers():
            if not m.isfile():
                continue
            data = tf.extractfile(m).read()
            rows.append((m.name, len(data), hashlib.md5(data).hexdigest()))
    return local_df(
        spark, sorted(rows), "member string, n_bytes long, content_md5 string"
    ).orderBy("member")


# ---------------------------------------------------------------------------
# K2 transactional behaviors: snapshot versioning + time travel
# ---------------------------------------------------------------------------

# (srs, project, taxon, strategy) per committed version:
#   v0  write    — 4 rows
#   v1  partial_update — SRS3 gains AMPLICON (COW: only taxon=txidB
#       files rewritten; txidA/txidC carried by reference)
#   v2  upsert   — SRS9 inserted under txidZ AND SRS4 MOVED txidC→txidA
#       (the move guard: old row gone, emptied partition dropped from
#       the manifest, v0/v1 still time-travel to the pre-move state)
TT_V0 = [
    ("SRS1", "PRJ1", "txidA", None),
    ("SRS2", "PRJ1", "txidA", None),
    ("SRS3", "PRJ2", "txidB", None),
    ("SRS4", "PRJ3", "txidC", None),
]


def _tt_sql() -> str:
    v1 = [
        (s, p, t, "AMPLICON" if s == "SRS3" else st)
        for s, p, t, st in TT_V0
    ]
    v2 = [
        ("SRS4", "PRJ3", "txidA", "WGS") if s == "SRS4" else (s, p, t, st)
        for s, p, t, st in v1
    ] + [("SRS9", "PRJ9", "txidZ", "AMPLICON")]
    rows = ", ".join(
        "({}, '{}', '{}', {})".format(
            v, s, t, "NULL" if st is None else f"'{st}'"
        )
        for v, snap in ((0, TT_V0), (1, v1), (2, v2))
        for s, _p, t, st in snap
    )
    return f"""
SELECT * FROM (VALUES {rows})
  t(version, srs, taxon, library_strategy)
ORDER BY version, srs
"""


@plan("sink_timetravel_roundtrip", oracle=_tt_sql())
def sink_timetravel_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 transactional sink (storage_versioned.VersionedWarehouse):
    three REAL commits — write, partition-pruned partial_update,
    key-moving upsert — then every snapshot read back by TIME TRAVEL
    and unioned as (version, srs, taxon, library_strategy). The oracle
    re-derives each version's expected state independently as VALUES.
    Gates: snapshot immutability (v0/v1 unchanged after v2's move),
    non-null-field-only partial update, insert + partition move in one
    upsert. File-level COW/conflict/vacuum invariants are pinned in
    tests/test_storage_versioned.py (not value-hashable).

    Shape: commits are O(touched partitions' files) + an O(1) atomic
    manifest create; each time-travel read scans only its snapshot's
    file list. Nothing here grows with warehouse size except the
    touched data itself."""
    from compendium_spark.schemas import SAMPLES  # noqa: PLC0415
    from compendium_spark.storage_versioned import (  # noqa: PLC0415
        VersionedWarehouse,
    )

    def full_rows(rows):
        return _one_slice_df(
            spark,
            [
                (s, p, t, None, st, None, None, None, None, None)
                for s, p, t, st in rows
            ],
            SAMPLES,
        )

    wd = _workdir("timetravel")
    vwh = VersionedWarehouse(spark, str(wd / "vwh"))
    vwh.write("samples", full_rows(TT_V0))
    vwh.partial_update(
        "samples",
        local_df(
            spark, [("SRS3", "AMPLICON")], "srs string, library_strategy string"
        ),
        key="srs",
    )
    vwh.upsert(
        "samples",
        full_rows(
            [("SRS4", "PRJ3", "txidA", "WGS"), ("SRS9", "PRJ9", "txidZ", "AMPLICON")]
        ),
        key="srs",
    )
    out = None
    for v in vwh.versions("samples"):
        snap = vwh.read("samples", v).select(
            F.lit(v).alias("version"), "srs", "taxon", "library_strategy"
        )
        out = snap if out is None else out.unionByName(snap)
    return out.orderBy("version", "srs")


# ---------------------------------------------------------------------------
# data skipping + compaction + exactly-once (built + pinned in r11,
# registered r12 — VERDICT r11 #1)
# ---------------------------------------------------------------------------

# (id, src, score) per single-file append — disjoint id ranges and
# distinct sources per file, so each probe below has a provably
# skippable file set (pinned at the file level in
# tests/test_storage_versioned.py; the plan itself hashes VALUES).
STATS_ROWS = [
    (0, "a", 0.5), (1, "a", 1.5), (2, "a", 2.5),
    (3, "b", 3.5), (4, "b", 4.5), (5, "b", 5.5),
    (6, "c", 6.5), (7, "c", 7.5), (8, "c", 8.5),
]

# (probe label, where-conjuncts, SQL predicate) — the same predicate
# expressed for the engine's pruned read and for the DuckDB oracle
STATS_PROBES = [
    ("range", [("id", ">=", 6), ("id", "<=", 8)], "id >= 6 AND id <= 8"),
    ("eq_src", [("src", "=", "b")], "src = 'b'"),
    ("in_ids", [("id", "in", [1, 7])], "id IN (1, 7)"),
]


def _stats_sql() -> str:
    rows = ", ".join(f"({i}, '{s}', {v})" for i, s, v in STATS_ROWS)
    probes = "\nUNION ALL\n".join(
        f"SELECT '{label}' AS probe, id, src, score "
        f"FROM t WHERE {pred}"
        for label, _w, pred in STATS_PROBES
    )
    return f"""
WITH t AS (SELECT * FROM (VALUES {rows}) v(id, src, score))
SELECT * FROM ({probes}) ORDER BY probe, id
"""


def _metrics_schema():
    from pyspark.sql import types as T  # noqa: PLC0415

    return T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("src", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )


@plan("sink_stats_pruned_scan", oracle=_stats_sql())
def sink_stats_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest column-stats data skipping
    (storage_versioned.VersionedWarehouse): three single-file commits
    with disjoint id ranges / sources, then three predicate reads that
    each go through `read(..., where=...)` — the snapshot's file list
    is min/max-pruned from the MANIFEST (parquet-footer stats harvested
    at commit, Iceberg-style) before Spark opens a file, and the same
    predicate runs as a residual filter. The oracle re-derives each
    probe from the fixture VALUES, so the hash proves pruning loses no
    rows; that files WERE skipped (2 of 3 per probe) is pinned at the
    file level in tests/test_storage_versioned.py.

    Shape: the skipping decision is O(files) driver arithmetic over the
    manifest — at 100 TB this is the difference between opening every
    file of a table and opening the partitions-worth that can match
    (Iceberg/Delta data skipping, reproduced on the native layout)."""
    from compendium_spark.storage_versioned import (  # noqa: PLC0415
        VersionedWarehouse,
    )

    wd = _workdir("stats_scan")
    vwh = VersionedWarehouse(
        spark, str(wd / "vwh"), extra_tables={"metrics": _metrics_schema()}
    )
    for lo in (0, 3, 6):
        batch = _one_slice_df(spark, STATS_ROWS[lo : lo + 3], _metrics_schema())
        if lo == 0:
            vwh.write("metrics", batch)
        else:
            vwh.append("metrics", batch)
    out = None
    for label, where, _pred in STATS_PROBES:
        probe = vwh.read("metrics", where=where).select(
            F.lit(label).alias("probe"), "id", "src", "score"
        )
        out = probe if out is None else out.unionByName(probe)
    return out.orderBy("probe", "id")


# (srs, taxon) per commit of the compaction fixture: 1 write + 2
# appends leave taxidA with 3 files and the null taxon with 2; txidB
# stays single-file (the carry-by-reference control, pinned in tests).
COMPACT_V0 = [("SRS1", "txidA"), ("SRS2", "txidB")]
COMPACT_V1 = [("SRS3", "txidA"), ("SRS4", None)]
COMPACT_V2 = [("SRS5", "txidA"), ("SRS6", None)]


def _compact_sql() -> str:
    snaps = []
    acc = []
    for rows in (COMPACT_V0, COMPACT_V1, COMPACT_V2):
        acc = acc + list(rows)
        snaps.append(list(acc))
    snaps.append(list(acc))  # v3 = compact: content-identical to v2
    rows = ", ".join(
        "({}, '{}', {})".format(v, s, "NULL" if t is None else f"'{t}'")
        for v, snap in enumerate(snaps)
        for s, t in snap
    )
    return f"""
SELECT * FROM (VALUES {rows}) t(version, srs, taxon)
ORDER BY version, srs
"""


@plan("sink_compaction_roundtrip", oracle=_compact_sql())
def sink_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE round-trip (storage_versioned.VersionedWarehouse
    .compact): micro-batch appends fragment the partitioned `samples`
    table (3 files under txidA, 2 under the null taxon), then compact
    bin-packs each fragmented partition into one file as a NEW
    snapshot. The plan returns every version's content — v3 (post-
    compact) must be row-identical to v2, and v0–v2 must still
    time-travel untouched; the oracle re-derives all four snapshots
    from the fixture VALUES. File-level invariants (counts drop,
    single-file txidB carried by reference, vacuum reclaims the old
    small files) are pinned in tests/test_storage_versioned.py.

    Shape: the compaction decision reads manifests, not data; the
    rewrite shuffles ONLY the fragmented partitions' rows once on
    (partition, bin). This is the maintenance op that keeps a
    streaming-ingested 100 TB table scannable — small files are the
    per-file-open scan killer."""
    from compendium_spark.schemas import SAMPLES  # noqa: PLC0415
    from compendium_spark.storage_versioned import (  # noqa: PLC0415
        VersionedWarehouse,
    )

    def batch(rows):
        return _one_slice_df(
            spark,
            [
                (s, "PRJ1", t, None, None, None, None, None, None, None)
                for s, t in rows
            ],
            SAMPLES,
        )

    wd = _workdir("compaction")
    vwh = VersionedWarehouse(spark, str(wd / "vwh"))
    vwh.write("samples", batch(COMPACT_V0))
    vwh.append("samples", batch(COMPACT_V1))
    vwh.append("samples", batch(COMPACT_V2))
    vwh.compact("samples", target_file_bytes=128 * 1024 * 1024)
    out = None
    for v in vwh.versions("samples"):
        snap = vwh.read("samples", v).select(
            F.lit(v).alias("version"), "srs", "taxon"
        )
        out = snap if out is None else out.unionByName(snap)
    return out.orderBy("version", "srs")


# exactly-once fold fixture: micro-batches delivered (id, rows);
# batch 0 is DELIVERED TWICE (Structured Streaming's at-least-once
# crash recovery) and an out-of-order replay lands after batch 2 —
# the txn protocol must fold each batch exactly once.
EO_H0 = "2024-01-01 10:00:00"
EO_H1 = "2024-01-01 11:00:00"
EO_BATCHES = [
    (0, [(EO_H0, "click", 1.25), (EO_H0, "click", 2.25), (EO_H1, "view", 4.5)]),
    (0, [(EO_H0, "click", 1.25), (EO_H0, "click", 2.25), (EO_H1, "view", 4.5)]),
    (1, [(EO_H0, "view", 8.0), (EO_H1, "view", 0.5)]),
    (2, [(EO_H1, "click", 3.0)]),
    (0, [(EO_H0, "click", 1.25), (EO_H0, "click", 2.25), (EO_H1, "view", 4.5)]),
]


def _eo_sql() -> str:
    # fold each DISTINCT batch id exactly once — the oracle's own
    # dedup is by id, independent of the engine's txn bookkeeping
    seen, rows = set(), []
    for bid, batch in EO_BATCHES:
        if bid in seen:
            continue
        seen.add(bid)
        rows += batch
    agg: dict = {}
    for hour, et, val in rows:
        n, t = agg.get((hour, et), (0, 0.0))
        agg[(hour, et)] = (n + 1, t + val)
    n_commits = len(seen) - 1  # version numbers start at 0
    values = ", ".join(
        f"(TIMESTAMP '{h}', '{et}', CAST({n} AS BIGINT), {t!r}, "
        f"CAST({n_commits} AS BIGINT))"
        for (h, et), (n, t) in sorted(agg.items())
    )
    return f"""
SELECT * FROM (VALUES {values})
  t(hour, event_type, n_events, total_value, last_version)
ORDER BY hour, event_type
"""


@plan("sink_exactly_once_roundtrip", oracle=_eo_sql())
def sink_exactly_once_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming fold
    (streaming/windows.mv_refresh_versioned_sink +
    VersionedWarehouse writer txns): the fixture delivers batch 0
    TWICE back-to-back and once more OUT OF ORDER after later batches
    — exactly Structured Streaming's at-least-once replay surface.
    The plan returns the stored MV plus the warehouse's last committed
    version; the oracle folds each DISTINCT batch id once. Replay
    damage is unhidable: a double-counted batch changes n_events /
    total_value, and a replay that COMMITTED (instead of skipping)
    changes last_version.

    Shape: the skip check is one O(1) manifest read per micro-batch;
    each fold commit is O(touched keys). The protocol is Delta's
    txnAppId/txnVersion, reproduced on the native snapshot layout."""
    from compendium_spark.storage_versioned import (  # noqa: PLC0415
        VersionedWarehouse,
    )
    from compendium_spark.streaming.windows import (  # noqa: PLC0415
        MV_HOURLY_SCHEMA,
        mv_refresh_versioned_sink,
    )

    wd = _workdir("exactly_once")
    vwh = VersionedWarehouse(
        spark, str(wd / "vwh"), extra_tables={"mv_hourly": MV_HOURLY_SCHEMA}
    )
    sink = mv_refresh_versioned_sink(vwh)
    for bid, batch in EO_BATCHES:
        bdf = local_df(
            spark,
            [(b[0], b[1], b[2]) for b in batch],
            "hour string, event_type string, value double",
        ).select(
            F.to_timestamp("hour").alias("hour"), "event_type", "value"
        )
        sink(bdf, bid)
    return (
        vwh.read("mv_hourly")
        .select(
            "hour",
            "event_type",
            "n_events",
            "total_value",
            F.lit(vwh.latest("mv_hourly")).cast("long").alias("last_version"),
        )
        .orderBy("hour", "event_type")
    )


# ---------------------------------------------------------------------------
# round 12: COW DELETE + row-level change data feed
# ---------------------------------------------------------------------------

# (srs, taxon, strategy) of the delete fixture's base snapshot; the
# predicate removes SRS2 and SRS5 (two taxa touched, txidC untouched —
# the carry-by-reference control pinned at the file level below)
DEL_BASE = [
    ("SRS1", "txidA", "AMPLICON"),
    ("SRS2", "txidA", "WGS"),
    ("SRS3", "txidB", "AMPLICON"),
    ("SRS4", "txidC", "WGS"),
    ("SRS5", "txidB", "WGS"),
]
DEL_KEYS = ["SRS2", "SRS5"]


def _delete_sql() -> str:
    snaps = [DEL_BASE, [r for r in DEL_BASE if r[0] not in DEL_KEYS]]
    rows = ", ".join(
        f"({v}, '{s}', '{t}', '{st}')"
        for v, snap in enumerate(snaps)
        for s, t, st in snap
    )
    return f"""
SELECT * FROM (VALUES {rows}) t(version, srs, taxon, library_strategy)
ORDER BY version, srs
"""


@plan("sink_delete_roundtrip", oracle=_delete_sql())
def sink_delete_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COW DELETE round-trip (storage_versioned.VersionedWarehouse
    .delete — Delta's `DELETE FROM t WHERE ...`): a point IN-predicate
    removes two keys in a NEW snapshot; the plan returns both versions'
    contents (pre-delete state must still time-travel), the oracle
    re-derives them from VALUES. File-level invariants — only the
    stats/hint-pruned candidate files rewrite, the untouched
    partition's file is carried path-identically — are pinned in
    tests/test_r12_plans.py.

    Shape: the rewrite set is the PRUNED candidate list (partition
    values + the srs membership hints both exclude files), so delete
    I/O is O(files that might match), not O(table) — at 100 TB the
    difference between rewriting a slice and rewriting everything."""
    from compendium_spark.schemas import SAMPLES  # noqa: PLC0415
    from compendium_spark.storage_versioned import (  # noqa: PLC0415
        VersionedWarehouse,
    )

    wd = _workdir("delete")
    vwh = VersionedWarehouse(spark, str(wd / "vwh"))
    vwh.write(
        "samples",
        _one_slice_df(
            spark,
            [
                (s, "PRJ1", t, None, st, None, None, None, None, None)
                for s, t, st in DEL_BASE
            ],
            SAMPLES,
        ),
    )
    vwh.delete("samples", [("srs", "in", DEL_KEYS)])
    out = None
    for v in vwh.versions("samples"):
        snap = vwh.read("samples", v).select(
            F.lit(v).alias("version"), "srs", "taxon", "library_strategy"
        )
        out = snap if out is None else out.unionByName(snap)
    return out.orderBy("version", "srs")


def _cdf_sql() -> str:
    # step 1 = v0->v1 (update SRS3 + insert SRS9), step 2 = v1->v2
    # (delete SRS2) — Delta CDF conventions: updates emit both images
    rows = ", ".join(
        f"({step}, '{ct}', '{s}', '{t}', {st})"
        for step, ct, s, t, st in [
            (1, "insert", "SRS9", "txidZ", "'WGS'"),
            (1, "update_preimage", "SRS3", "txidB", "NULL"),
            (1, "update_postimage", "SRS3", "txidB", "'AMPLICON'"),
            (2, "delete", "SRS2", "txidA", "NULL"),
        ]
    )
    return f"""
SELECT * FROM (VALUES {rows})
  t(step, _change_type, srs, taxon, library_strategy)
ORDER BY step, _change_type, srs
"""


@plan("sink_cdf_roundtrip", oracle=_cdf_sql())
def sink_cdf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level CHANGE DATA FEED round-trip
    (storage_versioned.VersionedWarehouse.table_changes — Delta CDF):
    three commits (write, update+insert upsert, point delete), then
    the feed between each consecutive snapshot pair, tagged
    insert / delete / update_preimage / update_postimage. The oracle
    is the expected feed as VALUES — a carried row leaking into the
    feed, a missed image, or a mistyped change breaks the hash.

    Shape: the feed reads ONLY the manifest diff's removed (pre) and
    added (post) files — O(changed data), not O(table); rows rewritten
    unchanged (partition COW collateral) cancel in the null-safe
    column comparison. At 100 TB this is the downstream-sync primitive:
    incremental consumers read the feed, never the table."""
    from compendium_spark.schemas import SAMPLES  # noqa: PLC0415
    from compendium_spark.storage_versioned import (  # noqa: PLC0415
        VersionedWarehouse,
    )

    def mk(rows):
        return _one_slice_df(
            spark,
            [
                (s, "PRJ1", t, None, st, None, None, None, None, None)
                for s, t, st in rows
            ],
            SAMPLES,
        )

    wd = _workdir("cdf")
    vwh = VersionedWarehouse(spark, str(wd / "vwh"))
    vwh.write(
        "samples",
        mk(
            [
                ("SRS1", "txidA", None),
                ("SRS2", "txidA", None),
                ("SRS3", "txidB", None),
            ]
        ),
    )
    vwh.upsert(
        "samples",
        mk([("SRS3", "txidB", "AMPLICON"), ("SRS9", "txidZ", "WGS")]),
        "srs",
    )
    vwh.delete("samples", [("srs", "=", "SRS2")])
    out = None
    for step, (v1, v2) in enumerate([(0, 1), (1, 2)], start=1):
        feed = vwh.table_changes("samples", v1, v2, "srs").select(
            F.lit(step).alias("step"),
            "_change_type",
            "srs",
            "taxon",
            "library_strategy",
        )
        out = feed if out is None else out.unionByName(feed)
    return out.orderBy("step", "_change_type", "srs")


# ---------------------------------------------------------------------------
# round 12: incremental view maintenance driven by the change feed
# ---------------------------------------------------------------------------

# commits: v0 write, v1 upsert (moves SRS4 txidC->txidA + inserts SRS9),
# v2 delete (SRS2). The per-taxon count MV is maintained INCREMENTALLY
# from table_changes deltas — never recomputed from the table.
IVM_V0 = [
    ("SRS1", "txidA"),
    ("SRS2", "txidA"),
    ("SRS3", "txidB"),
    ("SRS4", "txidC"),
]


def _ivm_sql() -> str:
    mvs = [
        {"txidA": 2, "txidB": 1, "txidC": 1},  # v0
        {"txidA": 3, "txidB": 1, "txidZ": 1},  # v1: SRS4 moved, SRS9 new
        {"txidA": 2, "txidB": 1, "txidZ": 1},  # v2: SRS2 deleted
    ]
    rows = ", ".join(
        f"({v}, '{t}', CAST({n} AS BIGINT))"
        for v, mv in enumerate(mvs)
        for t, n in sorted(mv.items())
    )
    return f"""
SELECT * FROM (VALUES {rows}) t(version, taxon, n_rows)
ORDER BY version, taxon
"""


@plan("mv_cdf_incremental", oracle=_ivm_sql())
def mv_cdf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance OFF the change feed: a per-taxon
    count MV is seeded from snapshot v0, then each later snapshot's MV
    is the previous MV plus the per-group contribution of
    `table_changes` deltas (+1 insert / −1 delete / −pre +post for
    updates — a partition MOVE lands as ±1 on two groups), groups
    reaching zero dropped. The plan emits every version's maintained
    MV; the oracle states each expected MV as VALUES, so a wrong
    delta sign, a leaked carried row, or a missed move breaks the
    hash. tests/test_r12_plans.py additionally pins the maintained
    MV equal to a from-scratch aggregate of the same snapshot.

    Shape: this is the downstream-consumer contract the CDF exists
    for — refresh cost is O(changed rows) + a join against the MV on
    the group key, never a rescan of the table. At 100 TB the same
    fold runs in foreachBatch against a streaming change feed (the
    exactly-once txn sink already gates the delivery side)."""
    from compendium_spark.schemas import SAMPLES  # noqa: PLC0415
    from compendium_spark.storage_versioned import (  # noqa: PLC0415
        VersionedWarehouse,
    )

    def mk(rows):
        return _one_slice_df(
            spark,
            [
                (s, "PRJ1", t, None, None, None, None, None, None, None)
                for s, t in rows
            ],
            SAMPLES,
        )

    wd = _workdir("ivm")
    vwh = VersionedWarehouse(spark, str(wd / "vwh"))
    vwh.write("samples", mk(IVM_V0))
    vwh.upsert(
        "samples", mk([("SRS4", "txidA"), ("SRS9", "txidZ")]), "srs"
    )
    vwh.delete("samples", [("srs", "=", "SRS2")])

    mv = (
        vwh.read("samples", 0)
        .groupBy("taxon")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    out = mv.select(F.lit(0).alias("version"), "taxon", "n_rows")
    for v in (1, 2):
        feed = vwh.table_changes("samples", v - 1, v, "srs")
        delta = (
            feed.select(
                "taxon",
                F.when(
                    F.col("_change_type").isin("insert", "update_postimage"),
                    F.lit(1),
                )
                .otherwise(F.lit(-1))
                .alias("d"),
            )
            .groupBy("taxon")
            .agg(F.sum("d").cast("long").alias("d"))
        )
        mv = (
            mv.join(delta, "taxon", "full_outer")
            .select(
                "taxon",
                (
                    F.coalesce("n_rows", F.lit(0))
                    + F.coalesce("d", F.lit(0))
                )
                .cast("long")
                .alias("n_rows"),
            )
            .filter(F.col("n_rows") > 0)
        )
        out = out.unionByName(
            mv.select(F.lit(v).alias("version"), "taxon", "n_rows")
        )
    return out.orderBy("version", "taxon")


# ---------------------------------------------------------------------------
# round 12: partition spec evolution round-trip
# ---------------------------------------------------------------------------

# v0 write under the taxon spec — ONE txidA file holding rows of TWO
# projects (the mixed-layout correctness trap); v1 set-spec:project
# (metadata-only, content identical); v2 append in the new layout;
# v3 upsert touching only PRJ1 — the old file rewrites WITH its PRJ2
# bystander row, both migrating to the new layout.
SPEC_V0 = [
    ("SRS1", "PRJ1", "txidA"),
    ("SRS2", "PRJ2", "txidA"),
    ("SRS3", "PRJ3", "txidB"),
]


def _spec_sql() -> str:
    v2 = SPEC_V0 + [("SRS4", "PRJ4", "txidC")]
    v3 = [("SRS1", "PRJ1", "txidZ") if s == "SRS1" else (s, p, t) for s, p, t in v2]
    rows = ", ".join(
        f"({v}, '{s}', '{p}', '{t}')"
        for v, snap in ((0, SPEC_V0), (1, SPEC_V0), (2, v2), (3, v3))
        for s, p, t in snap
    )
    return f"""
SELECT * FROM (VALUES {rows}) t(version, srs, project, taxon)
ORDER BY version, srs
"""


@plan("sink_spec_evolution_roundtrip", oracle=_spec_sql())
def sink_spec_evolution_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION SPEC EVOLUTION round-trip (Iceberg replace-spec,
    storage_versioned.set_partition_spec): the table starts hive-
    partitioned on taxon, evolves to project METADATA-ONLY (v1 content
    hash-identical to v0, zero files rewritten — pinned at file level
    in tests/test_storage_versioned.py), appends land in the new
    layout, and a merge touching one new-spec partition rewrites the
    old-layout FILE it lives in without losing that file's bystander
    rows from other partitions — the mixed-layout correctness trap.
    Every version read back by time travel; the oracle re-derives each
    state from VALUES.

    Shape: evolution itself is O(1) (one manifest); mixed-layout reads
    group files by layout dir and reconstruct hive columns per group;
    rewrites migrate exactly the files they touch, so a table drains
    to the new layout at merge/compact pace with no stop-the-world
    rewrite — the Iceberg behavior, reproduced on the native layout."""
    from compendium_spark.schemas import SAMPLES  # noqa: PLC0415
    from compendium_spark.storage_versioned import (  # noqa: PLC0415
        VersionedWarehouse,
    )

    def mk(rows):
        return _one_slice_df(
            spark,
            [
                (s, p, t, None, None, None, None, None, None, None)
                for s, p, t in rows
            ],
            SAMPLES,
        )

    wd = _workdir("spec_evolution")
    vwh = VersionedWarehouse(spark, str(wd / "vwh"))
    vwh.write("samples", mk(SPEC_V0))
    vwh.set_partition_spec("samples", "project")
    vwh.append("samples", mk([("SRS4", "PRJ4", "txidC")]))
    vwh.upsert("samples", mk([("SRS1", "PRJ1", "txidZ")]), "srs")
    out = None
    for v in vwh.versions("samples"):
        snap = vwh.read("samples", v).select(
            F.lit(v).alias("version"), "srs", "project", "taxon"
        )
        out = snap if out is None else out.unionByName(snap)
    return out.orderBy("version", "srs")
