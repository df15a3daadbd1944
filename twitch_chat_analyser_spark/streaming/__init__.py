"""Structured Streaming write path (SURVEY.md §7.4)."""
