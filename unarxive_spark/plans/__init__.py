"""Driver-contract query plans + DuckDB oracle SQL (SURVEY.md §5)."""
