"""scans queries (filled in progressively)."""
