"""Analyzer-layer operators (SURVEY §2.2-§2.7) + training-data-pipeline
operators (dedup / similarity / text analysis)."""
