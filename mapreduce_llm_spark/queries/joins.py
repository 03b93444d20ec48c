"""joins queries (filled in progressively)."""
