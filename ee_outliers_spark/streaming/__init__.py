"""Incremental / streaming semantics (SURVEY §2.9)."""
