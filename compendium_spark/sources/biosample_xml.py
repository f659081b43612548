"""BioSample full-text XML source (SURVEY §2.1 S1, U4).

Reference behavior (`/root/reference/db.py:194-263`):
  * iterate `<BioSample>` elements of a BioSampleSet export;
  * srs = text of `Ids/Id[@db='SRA']`; samples without one are
    SKIPPED (`db.py:233-237`);
  * tags: every `<Attribute>`; key = @harmonized_name if present else
    @attribute_name (`db.py:253-256`); value lower-cased
    (`db.py:252`); attributes with empty text skipped (`db.py:250`);
    duplicate keys within a sample → LAST one wins (dict semantics,
    `db.py:248-259`).

Spark-first implementation: Spark 4's native XML reader
(`rowTag='BioSample'`) turns each element into a nested row, then
attribute precedence / lower-casing / dedup are plain column
expressions — no Python in the hot path, splittable input. A
`mapInPandas` ElementTree fallback is provided for environments
without the XML datasource.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from compendium_spark.operators.keys import surrogate_key


def read_biosample_xml(spark: SparkSession, path: str) -> DataFrame:
    """Raw parse: one row per BioSample with srs + attribute array.

    Columns: srs string, attrs array<struct<tag string, value string,
    pos long>> (pos = document order, for last-wins dedup).
    """
    try:
        raw = (
            spark.read.format("xml")
            .option("rowTag", "BioSample")
            .load(path)
        )
        return _project_native(raw)
    except Exception:
        return _read_via_pandas(spark, path)


def _project_native(raw: DataFrame) -> DataFrame:
    # Ids.Id may be a single struct or an array depending on the doc;
    # normalize to array. Attribute text is `_VALUE`, attributes are
    # `_db`, `_harmonized_name`, `_attribute_name` in Spark's XML reader.
    ids = "Ids.Id"
    id_field = raw.schema["Ids"].dataType["Id"].dataType.typeName()
    id_arr = F.col(ids) if id_field == "array" else F.array(F.col(ids))
    # LAST SRA id wins: the reference's loop overwrites `sra` on every
    # match (db.py:230-232), so a (malformed) sample with several
    # SRA ids resolves to the final one — F.get is null-safe on the
    # empty array (size-1 == -1 → null; ANSI [0] would throw), found
    # by the r14 differential fuzz (tests/test_r14_xml_fuzz.py).
    sra_ids = F.filter(id_arr, lambda x: x["_db"] == "SRA")
    srs = F.get(sra_ids, F.size(sra_ids) - 1)["_VALUE"]

    attr_type = raw.schema["Attributes"].dataType["Attribute"].dataType.typeName()
    attr_col = (
        F.col("Attributes.Attribute")
        if attr_type == "array"
        else F.array(F.col("Attributes.Attribute"))
    )
    # empty-text attributes are skipped (db.py:250-251); so are
    # attributes carrying NEITHER name attribute — the reference's
    # if/elif has no else branch (db.py:253-256), r14 fuzz finding
    attr_col = F.filter(
        attr_col,
        lambda a: a["_VALUE"].isNotNull()
        & (a["_VALUE"].cast("string") != "")
        & (a["_harmonized_name"].isNotNull() | a["_attribute_name"].isNotNull()),
    )
    attrs = F.transform(
        attr_col,
        lambda a, i: F.struct(
            F.coalesce(a["_harmonized_name"], a["_attribute_name"]).alias("tag"),
            F.lower(a["_VALUE"].cast("string")).alias("value"),
            i.cast("long").alias("pos"),
        ),
    )
    return (
        raw.select(srs.alias("srs"), attrs.alias("attrs"))
        .filter(F.col("srs").isNotNull())  # skip samples without SRA id (db.py:233-237)
    )


def _read_via_pandas(spark: SparkSession, path: str) -> DataFrame:
    """Fallback: whole-file read + ElementTree in mapInPandas.

    Parallelism = number of files; fine for the reference's one-big-
    export shape. (At scale, prefer the native XML source above —
    it splits within a file.)
    """
    import pandas as pd  # noqa: PLC0415

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    schema = (
        "srs string, attrs array<struct<tag string, value string, pos long>>"
    )

    def parse(batches):
        import xml.etree.ElementTree as ET  # noqa: PLC0415

        for pdf in batches:
            out = []
            for blob in pdf["content"]:
                root = ET.fromstring(bytes(blob))
                for sample in root.iter("BioSample"):
                    srs = None
                    ids = sample.find("Ids")
                    if ids is not None:
                        for id_el in ids.findall("Id"):
                            if id_el.get("db") == "SRA":
                                srs = id_el.text
                    if srs is None:
                        continue  # db.py:233-237
                    attrs = []
                    attrblock = sample.find("Attributes")
                    if attrblock is not None:
                        for pos, a in enumerate(attrblock.findall("Attribute")):
                            if a.text is None or a.text == "":
                                continue  # db.py:250
                            # PRESENCE precedence, not truthiness: a
                            # present-but-empty harmonized_name is the
                            # key (reference's `in attrib` check,
                            # db.py:253-256); neither name → dropped
                            # (no else branch). r14 fuzz findings.
                            if "harmonized_name" in a.attrib:
                                tag = a.attrib["harmonized_name"]
                            elif "attribute_name" in a.attrib:
                                tag = a.attrib["attribute_name"]
                            else:
                                continue
                            attrs.append((tag, a.text.lower(), pos))
                    out.append((srs, attrs))
            yield pd.DataFrame(out, columns=["srs", "attrs"])

    return files.mapInPandas(parse, schema=schema)


def to_samples(parsed: DataFrame, taxon: str, existing: DataFrame | None = None) -> DataFrame:
    """`samples` rows from parsed XML: (srs, taxon) — the insert at
    `db.py:244`. Anti-join against existing keys reproduces the
    preloaded-membership skip (`db.py:215-221`, `db.py:243` / J2)."""
    out = parsed.select("srs").distinct().withColumn("taxon", F.lit(taxon))
    if existing is not None:
        out = out.join(existing.select("srs"), on="srs", how="left_anti")
    return out


def to_tags(parsed: DataFrame, existing: DataFrame | None = None) -> DataFrame:
    """`tags` EAV rows with last-wins dedup (A10, `db.py:248-259`) and
    deterministic tagid (replaces autoincrement, SURVEY §7.2)."""
    exploded = parsed.select("srs", F.explode("attrs").alias("a")).select(
        "srs", F.col("a.tag").alias("tag"), F.col("a.value").alias("value"), F.col("a.pos").alias("pos")
    )
    w = Window.partitionBy("srs", "tag").orderBy(F.desc("pos"))
    deduped = (
        exploded.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("srs", "tag", "value")
    )
    if existing is not None:
        deduped = deduped.join(existing.select("srs").distinct(), on="srs", how="left_anti")
    return deduped.withColumn("tagid", surrogate_key("srs", "tag")).select(
        "tagid", "srs", "tag", "value"
    )
