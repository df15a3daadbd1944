"""Reusable series/scalar helpers (SURVEY.md §2.C, B14-B16)."""
