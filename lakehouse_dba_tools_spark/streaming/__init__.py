"""Structured Streaming operators (SURVEY.md §2.10 / §7 M6)."""
