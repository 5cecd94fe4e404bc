"""Operator battery modules (SURVEY §2 SQL-CHECK inventory)."""
