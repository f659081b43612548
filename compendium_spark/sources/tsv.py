"""Pipeline TSV sources (SURVEY §2.1 S4/S5/S7) + the wide→long melt (T1).

Formats per FIXTURES.md §3-6, parsed with spark.read.csv — header-
defined dynamic schema like the reference (`projects.py:215-218`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from compendium_spark.operators.keys import surrogate_key


def read_summary(spark: SparkSession, path: str, project: str | None = None) -> DataFrame:
    """`summary.tsv` (ref `projects.py:203-226`, `projects.py:579-597`).

    First header cell is blank → the row-name column arrives as `_c0`
    and becomes `srr` after stripping the 8-char file suffix
    (`srr[:-8]`, `projects.py:581`). Pairedness = presence of the
    `revse` column (`projects.py:588`); single-end files simply lack
    `revse`/`merged`.
    """
    df = spark.read.csv(path, sep="\t", header=True, inferSchema=False)
    first = df.columns[0]
    df = df.withColumnRenamed(first, "raw_name")
    is_paired = "revse" in df.columns
    out = df.select(
        F.expr("substring(raw_name, 1, length(raw_name)-8)").alias("srr"),  # projects.py:581
        F.col("dinput").cast("long").alias("dinput"),
        F.col("filter").cast("long").alias("filter"),
        F.col("forwd").cast("long").alias("forwd"),
        (F.col("revse").cast("long") if is_paired else F.lit(None).cast("long")).alias("revse"),
        (F.col("merged").cast("long") if is_paired else F.lit(None).cast("long")).alias("merged"),
        F.col("length").cast("long").alias("length"),
        F.col("nonchim").cast("long").alias("nonchim"),
        F.lit(is_paired).alias("is_paired"),
    )
    if project is not None:
        out = out.withColumn("project", F.lit(project))
    return out


def read_counts_wide(spark: SparkSession, path: str) -> DataFrame:
    """`ASVs_counts.tsv` wide matrix (ref `projects.py:418-440`):
    header = blank cell + sample names; rows = ASV + counts."""
    df = spark.read.csv(path, sep="\t", header=True, inferSchema=False)
    return df.withColumnRenamed(df.columns[0], "asv")


def melt_counts(wide: DataFrame) -> DataFrame:
    """Wide→long melt with zero-drop (T1/P7, ref `projects.py:431-440`).

    Built-in `unpivot`: row-local expansion, no shuffle; the zero
    filter drops sparse cells before anything is stored
    (`projects.py:438`). entryid is the deterministic surrogate for
    SQLite's autoincrement (`db.py:149-156`).
    """
    sample_cols = [c for c in wide.columns if c != "asv"]
    long = wide.unpivot("asv", sample_cols, "sample", "count_str")
    return (
        long.select("sample", "asv", F.col("count_str").cast("long").alias("count"))
        .filter(F.col("count") != 0)
        .withColumn("entryid", surrogate_key("sample", "asv"))
        .select("entryid", "sample", "asv", "count")
    )


def read_taxonomy(spark: SparkSession, path: str) -> DataFrame:
    """`ASVs_taxonomy.tsv` (ref `projects.py:461-468`): ASV label +
    6 ranks; loaded with constant tdatabase (`projects.py:517`).

    Duplicate ASV labels resolve LAST-wins, because the reference
    accumulates rows into a dict (`taxa[line[0]] = line[1:]`,
    projects.py:467) — the same dict semantics as the FASTA reader
    and the tags EAV dedup (A10); r14 differential-fuzz finding.
    Parsed as text + split('\\t') (the reference's exact tokenizer —
    no CSV quoting), keeping the line offset the last-wins window
    needs."""
    from pyspark.sql import Window  # noqa: PLC0415

    lines = (
        spark.read.text(path)
        .withColumn("file", F.input_file_name())
        .withColumn("offset", F.monotonically_increasing_id())
    )
    hdr = Window.partitionBy("file").orderBy("offset")
    body = (
        lines.withColumn("rn", F.row_number().over(hdr))
        .filter(F.col("rn") > 1)  # skip header line (projects.py:464)
        .withColumn("parts", F.split("value", "\t"))
    )
    last = Window.partitionBy("file", F.col("parts")[0]).orderBy(
        F.desc("offset")
    )
    return (
        body.withColumn("dup_rn", F.row_number().over(last))
        .filter(F.col("dup_rn") == 1)  # projects.py:467 — last wins
        .select(
            F.col("parts")[0].alias("asv"),
            F.col("parts")[1].alias("kingdom"),
            F.col("parts")[2].alias("phylum"),
            F.col("parts")[3].alias("tclass"),
            F.col("parts")[4].alias("torder"),
            F.col("parts")[5].alias("family"),
            F.col("parts")[6].alias("genus"),
        )
        .withColumn("tdatabase", F.lit("silva_nr99_v138_train_set"))  # projects.py:517
    )


def read_geo_countries(spark: SparkSession, path: str) -> DataFrame:
    """Geo lookup TSV → `geo_loc_countries` (ref `db.py:104-109`):
    two columns, raw geo_loc_name string → ISO-3166 alpha-2 code. The
    reference creates the table but ships no loader; this is the
    ingest path for it."""
    df = spark.read.csv(path, sep="\t", header=True, inferSchema=False)
    return df.select(
        F.col(df.columns[0]).alias("geo_loc_name"),
        F.col(df.columns[1]).alias("iso2"),
    )


def read_countries(spark: SparkSession, path: str) -> DataFrame:
    """Country dimension TSV → `countries` (ref `db.py:111-117`):
    iso2 PK, display name, region."""
    df = spark.read.csv(path, sep="\t", header=True, inferSchema=False)
    return df.select(
        F.col(df.columns[0]).alias("iso2"),
        F.col(df.columns[1]).alias("name"),
        F.col(df.columns[2]).alias("region"),
    )


def assemble_asv_tables(
    fasta: DataFrame, taxonomy: DataFrame, project: str
) -> tuple[DataFrame, DataFrame]:
    """Build `asv_sequences` + `asv_assignments` (ref `projects.py:
    442-523`). Deterministic asv_id = xxhash64(project, asv) computed
    independently on both sides — the reference's read-back remap join
    (J3, `projects.py:499-523`) disappears.

    `asv_sequences` rows exist only for ASVs present in the TAXONOMY
    file: the reference iterates `taxa.keys()` and looks each up in
    the fasta dict (`projects.py:478`), so a fasta-only ASV is never
    saved (r14 differential-fuzz finding; semi-join below). Deliberate
    softening (quirk-note): a taxonomy-only ASV crashes the reference
    with KeyError there — here it simply yields no sequence row (its
    assignment row still lands, exactly the rows the reference writes
    before it would crash)."""
    seqs = (
        fasta.join(
            F.broadcast(taxonomy.select("asv").distinct()),
            on="asv",
            how="left_semi",
        )
        .withColumn("project", F.lit(project))
        .withColumn("asv_id", surrogate_key("project", "asv"))
        .select("asv_id", "project", "asv", "seq")
    )
    assigns = (
        taxonomy.withColumn("project", F.lit(project))
        .withColumn("asv_id", surrogate_key("project", "asv"))
        .select(
            "asv_id", "tdatabase", "kingdom", "phylum", "tclass", "torder", "family", "genus"
        )
    )
    return seqs, assigns
