"""udfs queries (filled in progressively)."""
