"""Structured-Streaming incremental matching (the Gazetteer analog)."""
