"""Structured Streaming surface (incremental ingest — SURVEY.md §2.9)."""
