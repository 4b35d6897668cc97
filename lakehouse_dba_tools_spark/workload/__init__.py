"""Concurrent workload evaluation harness (reference pillar 2)."""
