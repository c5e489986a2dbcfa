"""Structured Streaming operators (windowed aggregation, streaming diff
counts)."""
