"""Reference-pipeline semantics: QC, disposition, amplicon inference,
enrichment, orchestration state machine."""
