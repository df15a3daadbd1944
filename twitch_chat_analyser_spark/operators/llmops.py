"""LLM-data-pipeline operators (dedup/similarity/text) — filled in phase 3."""

from __future__ import annotations

LLM_QUERIES: dict = {}


def llm_oracles() -> dict[str, str]:
    return {}
