"""Deduplication operators over the documents table (round-1 stubs filled below)."""
