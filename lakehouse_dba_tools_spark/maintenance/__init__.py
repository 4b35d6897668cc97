"""Catalog / maintenance / audit operators (SURVEY.md §2.9)."""
