"""Source/sink helpers (parquet/CSV/JSON readers, display sinks)."""
