"""Scalar function helpers (tokenization, cost model)."""
