"""events queries (filled in progressively)."""
