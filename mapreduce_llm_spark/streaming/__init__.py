"""Structured Streaming twins of the batch event-time operators."""
