"""Multimodal binary-column operators (filled in below)."""
