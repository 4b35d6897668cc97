"""Document deduplication operators (exact → near-dup), scale-first."""
