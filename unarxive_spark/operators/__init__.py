"""Relational + graph operators (SURVEY.md §2 inventory, Spark-first)."""
