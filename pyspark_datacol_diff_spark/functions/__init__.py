"""Reusable Column-expression builders (null-safe compare, vector math,
hashing) shared across operators."""
