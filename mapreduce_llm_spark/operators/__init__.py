"""Custom operators: chunking, LLM map, caching, dedup, similarity."""
