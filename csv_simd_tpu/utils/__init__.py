"""Cross-cutting utilities: observability, debug helpers."""
