"""Declarative query definitions, one module per SURVEY.md §2C category."""
