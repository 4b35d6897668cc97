"""Scalar/column function library (SURVEY.md §2.8 + text extensions)."""
