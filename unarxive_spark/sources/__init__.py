"""Table IO + checkpoint/lineage (SURVEY.md §2.1 scans/sinks)."""
