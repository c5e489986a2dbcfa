"""Operators: diff (core), dedup, similarity, text, multimodal."""
