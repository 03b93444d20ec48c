"""windows queries (filled in progressively)."""
