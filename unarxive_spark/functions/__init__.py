"""Scalar/array function surface (built-ins first; pandas UDFs only where
built-ins genuinely can't express the semantics — SURVEY.md §2.10)."""
