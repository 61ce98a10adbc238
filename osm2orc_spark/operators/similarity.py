"""Similarity-search operators over the embeddings table (filled in below)."""
