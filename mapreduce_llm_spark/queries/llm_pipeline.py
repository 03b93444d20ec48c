"""llm_pipeline queries (filled in progressively)."""
