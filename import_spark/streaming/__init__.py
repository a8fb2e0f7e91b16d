"""Incremental ingest (stretch coverage; the reference is batch-only)."""
