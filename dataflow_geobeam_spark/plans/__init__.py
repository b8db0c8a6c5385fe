"""Relational query library (plan-quality reference queries over testdata)."""
