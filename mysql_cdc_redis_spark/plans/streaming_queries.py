"""Structured Streaming query-catalog entries (SURVEY.md §7 Phase 3).

Filled in Phase 3 — module exists so catalog imports stay stable."""
