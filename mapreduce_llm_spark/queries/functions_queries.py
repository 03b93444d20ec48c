"""functions_queries queries (filled in progressively)."""
