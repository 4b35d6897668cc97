"""Multimodal (binary) column plumbing for training-data pipelines."""
