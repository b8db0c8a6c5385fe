"""Structured-streaming pipelines: watermarked windows, stateful join,
exactly-once manifest-committed sink, checkpoint resume, metrics."""
