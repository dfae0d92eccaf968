"""Analytical operators: reference-parity serving queries plus
large-scale extensions (joins/windows, dedup, similarity search, text
analysis, multimodal plumbing)."""
