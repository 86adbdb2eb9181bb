"""LLM-data-pipeline query-catalog entries (SURVEY.md §7 Phase 4):
dedup, similarity search, text analysis, multimodal plumbing.

Filled in Phase 4 — module exists so catalog imports stay stable."""
