"""Structured Streaming jobs and helpers (SURVEY.md §2.2.G)."""
