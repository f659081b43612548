"""compendium_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of ``blekhmanlab/compendium`` (a SQLite+Python batch ETL
tool for microbiome metadata) as an idiomatic Apache Spark DataFrame
engine, extended with the operators a large-scale training-data
pipeline needs (dedup, similarity search, text analysis, multimodal
column plumbing, streaming windows).

Design stance (SURVEY.md §7):
  * Everything relational is DataFrame/SQL — Catalyst plans it.
  * Deterministic surrogate keys (xxhash64) replace SQLite autoincrement.
  * Side effects (HTTP, git, sbatch, tar) live in thin adapters.
  * Every operator is a pure ``DataFrame -> DataFrame`` function so a
    DuckDB oracle can check it query-by-query.
"""

__version__ = "0.1.0"
