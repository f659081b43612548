"""File-format sources (SURVEY §2.1)."""
