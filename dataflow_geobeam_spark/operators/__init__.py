"""Relational + streaming operators: windows, skew salting, dedup, similarity."""
