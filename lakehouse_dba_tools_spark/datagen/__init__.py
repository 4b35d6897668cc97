"""Deterministic distributed benchmark-data generation (reference pillar 3)."""
