"""setops queries (filled in progressively)."""
