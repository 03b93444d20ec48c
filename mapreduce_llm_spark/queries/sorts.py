"""sorts queries (filled in progressively)."""
