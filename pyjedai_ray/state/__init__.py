"""Shared mutable state helpers (union-find, broadcast lookups)."""
