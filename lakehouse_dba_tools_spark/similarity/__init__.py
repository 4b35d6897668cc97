"""Embedding similarity search: brute-force baseline + LSH scale path."""
